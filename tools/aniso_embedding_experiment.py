"""768-dim ANISOTROPIC embedding fixture + the two experiments it
unblocks (r11 verdict item 7).

Both the r11 OPQ eigenvalue-allocation experiment and the PCAR+IVF
rerank-margin note were fixture-limited: the driver's synthetic
embeddings are 64-dim with a NEAR-FLAT spectrum, where every rotation
yields identical per-subspace variance and a 64->16 reduction cannot
show the arithmetic win of the production 768->64 regime. This tool
generates a seeded synthetic fixture with a realistic DECAYING
eigenspectrum (lambda_j ~ j^-1, the power-law shape of real text
embeddings; variance directions mixed through a random orthogonal
basis so anisotropy is NOT axis-aligned) and re-runs both experiments
as NumPy replays of the ENGINE's exact semantics:

- PQ / OPQ (operators/pq.py): codebook j from the j-th subvectors of
  the lowest-id sample (+ optional per-subspace Lloyd, first-min
  tie-break), LUT = round_half_up(1e6 * ||q_sub - C[c]||^2) BIGINT,
  integer ADC sum, (adist asc, id asc) top k*overfetch, exact cosine
  rescore — under three pre-transforms: raw space, full-rank PCA
  rotation, and PCA + eigenvalue allocation (Ge et al. 2013 parametric
  OPQ: assign principal dims, eigenvalue-descending, greedily to the
  subspace with the smallest log-eigenvalue product).
- PCAR (operators/dimred.py): train_pca-style model on the lowest-id
  sample (sign-canonicalized eigh, 1e-6 grid), reduced-space cosine
  candidate scan (6dp rounding, id ties) at out_dim in {16, 32, 64},
  exact full-dim rescore of k*overfetch candidates — recall@10 plus
  the candidate-scan arithmetic ratio dim/out_dim.

Usage: python tools/aniso_embedding_experiment.py [--n 20000]
Prints one JSON receipt; numbers land in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def _lut_int(p: np.ndarray) -> np.ndarray:
    """The engine's LUT grid (operators/pq.py::_adc_luts): half-away-
    from-zero to integer micro-units."""
    return (np.sign(p) * np.floor(np.abs(p) + 0.5)).astype(np.int64)

DIM = 768
M = 16          # PQ subspaces
N_CODES = 32
K = 10
OVERFETCH = 8
SAMPLE = 2048   # codebook / PCA training sample (lowest-id rows)
N_PROBES = 50


def make_fixture(n: int, dim: int = DIM, seed: int = 0) -> np.ndarray:
    """Seeded anisotropic gaussian: X = Z diag(sqrt(lambda)) Q with
    lambda_j = 1/j and Q a random orthogonal basis (QR of a seeded
    gaussian), so the principal directions are mixed across coordinates
    — the regime where a learned rotation can matter."""
    rng = np.random.RandomState(seed)
    lam = 1.0 / np.arange(1, dim + 1, dtype=np.float64)
    q, r = np.linalg.qr(rng.randn(dim, dim))
    q *= np.sign(np.diag(r))[None, :]  # deterministic sign convention
    z = rng.randn(n, dim)
    return (z * np.sqrt(lam)[None, :]) @ q.T


def exact_topk(X: np.ndarray, probes: np.ndarray, probe_ids: np.ndarray,
               k: int = K) -> dict[int, list[int]]:
    """Exact cosine top-k per probe, self excluded, 6dp rounding before
    ranking, (score desc, id asc) ties — the engine's kNN contract."""
    norms = np.linalg.norm(X, axis=1)
    qn = np.linalg.norm(probes, axis=1)
    cos = np.round((probes @ X.T) / (qn[:, None] * norms[None, :]), 6)
    out = {}
    n = X.shape[0]
    for i, qid in enumerate(probe_ids):
        order = np.lexsort((np.arange(n), -cos[i]))
        out[int(qid)] = [int(j) for j in order if j != qid][:k]
    return out


def pq_codebooks(X: np.ndarray, m: int, n_codes: int,
                 iters: int) -> list[np.ndarray]:
    """train_pq_codebooks replay: lowest-id seed rows + per-subspace
    Lloyd (first-min ties, empty clusters keep previous centroid)."""
    S = X[:SAMPLE]
    dsub = X.shape[1] // m
    books = []
    for j in range(m):
        sub = S[:, j * dsub: (j + 1) * dsub]
        C = sub[:n_codes].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(n_codes):
                members = sub[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books.append(C)
    return books


def pq_recall(X: np.ndarray, truth: dict[int, list[int]],
              iters: int) -> float:
    """encode_vectors + ADC search replay: codes by 6dp-rounded squared
    L2 argmin, LUT = round_half_up(1e6 * d2), integer ADC sum,
    (adist asc, id asc) top K*OVERFETCH, exact cosine rescore."""
    books = pq_codebooks(X, M, N_CODES, iters)
    dsub = X.shape[1] // M
    n = X.shape[0]
    codes = np.empty((n, M), dtype=np.int64)
    for j, C in enumerate(books):
        sub = X[:, j * dsub: (j + 1) * dsub]
        d2 = np.round(
            ((sub[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), 6
        )
        codes[:, j] = np.argmin(d2, axis=1)
    probe_ids = np.array(sorted(truth))
    probes = X[probe_ids]
    adist = np.zeros((len(probe_ids), n), dtype=np.int64)
    for j, C in enumerate(books):
        qsub = probes[:, j * dsub: (j + 1) * dsub]
        lut = _lut_int(
            1e6 * ((qsub[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        )
        adist += lut[np.arange(len(probe_ids))[:, None], codes[:, j][None, :]]
    kk = K * OVERFETCH
    hits = total = 0
    norms = np.linalg.norm(X, axis=1)
    for i, qid in enumerate(probe_ids):
        order = np.lexsort((np.arange(n), adist[i]))
        cand = [int(c) for c in order if c != qid][:kk]
        cos = np.round(
            (X[cand] @ X[qid]) / (norms[cand] * norms[qid]), 6
        )
        reorder = np.lexsort((np.array(cand), -cos))
        got = [cand[j] for j in reorder[:K]]
        hits += len(set(got) & set(truth[int(qid)]))
        total += len(truth[int(qid)])
    return hits / total


def pca_model(X: np.ndarray, out_dim: int):
    """train_pca replay: lowest-id sample, eigh largest-first,
    sign-canonicalized components, 1e-6 grid."""
    S = X[:SAMPLE]
    mu = S.mean(axis=0)
    Sc = S - mu
    evals, evecs = np.linalg.eigh(Sc.T @ Sc)
    comps = evecs[:, ::-1][:, :out_dim].T.copy()
    for c in comps:
        j = int(np.argmax(np.abs(c)))
        if c[j] < 0:
            c *= -1.0
    expl = float(evals[::-1][:out_dim].sum() / evals.sum())
    return (np.round(mu, 6), np.round(comps, 6), expl,
            evals[::-1] / evals.sum(), evals[::-1].copy())


def pcar_recall(X: np.ndarray, truth: dict[int, list[int]],
                out_dim: int) -> tuple[float, float]:
    """pca_knn replay: reduced-space cosine candidates (6dp, id ties),
    exact full-dim rescore of K*OVERFETCH. Returns (recall@10,
    explained-variance of the kept dims)."""
    mu, comps, expl, _, _ = pca_model(X, out_dim)
    R = (X - mu) @ comps.T
    probe_ids = np.array(sorted(truth))
    rn = np.linalg.norm(R, axis=1)
    rn[rn == 0] = 1.0
    kk = K * OVERFETCH
    hits = total = 0
    n = X.shape[0]
    norms = np.linalg.norm(X, axis=1)
    for qid in probe_ids:
        cos_r = np.round(R @ R[qid] / (rn * rn[qid]), 6)
        order = np.lexsort((np.arange(n), -cos_r))
        cand = [int(c) for c in order if c != qid][:kk]
        cos = np.round(
            (X[cand] @ X[qid]) / (norms[cand] * norms[qid]), 6
        )
        reorder = np.lexsort((np.array(cand), -cos))
        got = [cand[j] for j in reorder[:K]]
        hits += len(set(got) & set(truth[int(qid)]))
        total += len(truth[int(qid)])
    return hits / total, expl


def opq_allocation(evals_desc: np.ndarray, m: int, dsub: int) -> list[list[int]]:
    """Ge et al. parametric OPQ: assign principal dims, eigenvalue-
    descending, greedily to the open subspace with the smallest current
    log-eigenvalue product (capacity dsub each). The greedy balances
    PRODUCTS, so the eigenvalues must be >= 1 for "smallest product"
    to mean "least loaded" — normalize by the smallest eigenvalue
    first (shares < 1 flip every log negative and the greedy collapses
    onto one bucket)."""
    ev = evals_desc / max(float(evals_desc.min()), 1e-300)
    buckets: list[list[int]] = [[] for _ in range(m)]
    logs = np.zeros(m)
    for j in range(len(ev)):
        open_b = [b for b in range(m) if len(buckets[b]) < dsub]
        b = min(open_b, key=lambda bb: logs[bb])
        buckets[b].append(j)
        logs[b] += np.log(max(ev[j], 1e-300))
    return buckets


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    X = make_fixture(args.n)
    probe_ids = np.arange(N_PROBES)
    truth = exact_topk(X, X[probe_ids], probe_ids)

    # spectrum receipt: is the fixture actually anisotropic?
    mu_full, comps_full, _, spec, evals_raw = pca_model(X, DIM)
    top64 = float(spec[:64].sum())

    # --- OPQ: raw vs PCA-rotated vs PCA + eigenvalue allocation ---
    results = {}
    results["pq_raw"] = pq_recall(X, truth, args.iters)
    Xr = (X - mu_full) @ comps_full.T  # full-rank PCA rotation
    truth_r = exact_topk(Xr, Xr[probe_ids], probe_ids)
    results["pq_pca"] = pq_recall(Xr, truth_r, args.iters)
    dsub = DIM // M
    alloc = opq_allocation(evals_raw, M, dsub)
    perm = [j for b in alloc for j in b]
    Xa = Xr[:, perm]
    truth_a = exact_topk(Xa, Xa[probe_ids], probe_ids)
    results["pq_opq_alloc"] = pq_recall(Xa, truth_a, args.iters)
    # per-subspace variance spread under the allocation (the r11
    # flat-fixture receipt showed identical 0.1 per bucket; here the
    # spread is the whole point)
    bucket_var = [float(spec[b].sum()) for b in alloc]
    naive_var = [
        float(spec[j * dsub:(j + 1) * dsub].sum()) for j in range(M)
    ]

    # --- PCAR: 768 -> {64, 32, 16} reduce-then-rerank ---
    for od in (64, 32, 16):
        r, expl = pcar_recall(X, truth, od)
        results[f"pcar_{od}"] = {
            "recall_at_10": r,
            "explained_var": round(expl, 4),
            "candidate_scan_ratio": round(DIM / od, 1),
        }

    print(json.dumps({
        "n": args.n, "dim": DIM, "m": M, "n_codes": N_CODES,
        "iters": args.iters, "spectrum_top64_var": round(top64, 4),
        "opq_bucket_var_minmax_naive": [round(min(naive_var), 4),
                                        round(max(naive_var), 4)],
        "opq_bucket_var_minmax_alloc": [round(min(bucket_var), 4),
                                        round(max(bucket_var), 4)],
        "results": {k: (round(v, 4) if isinstance(v, float) else v)
                    for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
