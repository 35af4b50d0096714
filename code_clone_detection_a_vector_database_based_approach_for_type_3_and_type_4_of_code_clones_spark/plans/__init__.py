"""End-to-end pipelines mirroring the reference CLI entry points
(SURVEY SS3)."""

from .bcb import bcb_pipeline  # noqa: F401
from .corpus_prep import corpus_prep  # noqa: F401
from .poj import poj_pipeline  # noqa: F401
from .ship import prepare_and_ship  # noqa: F401
from .scalability import scalability_sweep  # noqa: F401
