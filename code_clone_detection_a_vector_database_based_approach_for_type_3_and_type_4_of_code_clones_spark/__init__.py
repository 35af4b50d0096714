"""PySpark-native analytics engine with the query/data-processing surface of
the reference repo ``ZahraSoula/Code-clone-detection-A-vector-database-based-
approach-for-type-3-and-type-4-of-code-clones`` ("Replika").

The reference is an eager, single-node pandas + Qdrant pipeline for detecting
type-3/type-4 code clones via dense-vector similarity search. This package
re-expresses every capability (SURVEY.md SS2) as lazy, distributed DataFrame
plans: the vector "collection" is a partitioned Parquet table, the per-query
kNN loop becomes one set-based similarity join, and the IR metrics
(Success@k / P@k / MRR / MAP@k) are window + aggregation plans.

Layout:
    functions/  scalar / array column expressions (cosine, hashes, text stats)
    operators/  relational & vector operators (kNN join, dedup, eval metrics)
    sources/    readers & sinks (CSV, directory corpus, vector index table)
    plans/      end-to-end pipelines mirroring the reference CLI entry points
    streaming/  structured-streaming variants (beyond-reference extension)

Everything here derives only from the public PySpark API and the reference's
observable behavior; nothing imports from or depends on the reference code.
"""

from __future__ import annotations

__version__ = "0.1.0"
