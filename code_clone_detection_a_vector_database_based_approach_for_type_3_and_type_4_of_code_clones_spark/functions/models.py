"""Embedding-model catalog (reference parity: embedding_models.yml:1-74).

The reference ships a registry of the SentenceTransformer models its
experiments cover — name, parameter count (millions), and whether the model
is general-purpose or code-tuned. The engine mirrors it so ``--model`` is
validated against a known catalog (an unknown name fails fast at the CLI
instead of erroring deep inside a worker's model download), plus the
engine's own ``hash`` pseudo-model (the deterministic, dependency-free
embedder used for tests and oracles, SURVEY SS5.2).

Names outside the catalog remain usable via ``--allow-any-model`` —
the reference accepts any HuggingFace id at runtime, so strict-but-
overridable is the faithful shape.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ModelInfo:
    name: str
    num_params_m: int  # millions of parameters (reference: num_params)
    kind: str  # "general" | "code" | "builtin"


_CATALOG_ROWS: tuple[tuple[str, int, str], ...] = (
    # mirrored from reference embedding_models.yml:1-74 (name, M params, type)
    ("stella_en_400M_v5", 435, "general"),
    ("learning2_model", 434, "general"),
    ("gte-large-en-v1.5", 434, "general"),
    ("cde-small-v1", 143, "general"),
    ("mxbai-embed-large-v1", 335, "general"),
    ("UAE-Large-V1", 335, "general"),
    ("GIST-large-Embedding-v0", 335, "general"),
    ("bge-large-en-v1.5", 335, "general"),
    ("b1ade-embed", 335, "general"),
    ("MUG-B-1.6", 335, "general"),
    ("gte-base-en-v1.5", 137, "general"),
    ("GIST-Embedding-v0", 109, "general"),
    ("bge-base-en-v1.5", 109, "general"),
    ("sf_model_e5", 335, "general"),
    ("mxbai-embed-2d-large-v1", 335, "general"),
    ("gte-large", 109, "general"),
    ("nomic-embed-text-v1", 137, "general"),
    ("mmlw-e5-base", 278, "general"),
    ("mmlw-e5-small", 118, "general"),
    ("mmlw-roberta-base", 124, "general"),
    ("mmlw-roberta-large", 435, "general"),
    ("st-polish-paraphrase-from-distilroberta", 125, "general"),
    ("distiluse-base-multilingual-cased-v1", 135, "general"),
    ("jinaai/jina-embeddings-v2-base-code", 161, "code"),
    # engine-native deterministic embedder (not in the reference catalog)
    ("hash", 0, "builtin"),
)

MODEL_CATALOG: dict[str, ModelInfo] = {
    name: ModelInfo(name, params, kind) for name, params, kind in _CATALOG_ROWS
}


def model_info(name: str) -> ModelInfo:
    """Catalog lookup; raises ``KeyError`` with the known-name list for an
    unknown model."""
    try:
        return MODEL_CATALOG[name]
    except KeyError:
        known = ", ".join(sorted(MODEL_CATALOG))
        raise KeyError(
            f"unknown embedding model {name!r}; known models: {known}"
        ) from None


def validate_model(name: str, allow_any: bool = False) -> str:
    """CLI-facing validation: returns the name if known (or ``allow_any``),
    else raises ``SystemExit`` with the catalog listing."""
    if allow_any or name in MODEL_CATALOG:
        return name
    known = "\n  ".join(sorted(MODEL_CATALOG))
    raise SystemExit(
        f"--model {name!r} is not in the model catalog "
        f"(use --allow-any-model to bypass). Known models:\n  {known}"
    )
