"""Sources & sinks (SURVEY SS2.1)."""

from .csv_io import read_clones_csv, read_functions_csv, write_results_csv  # noqa: F401
from .events import (  # noqa: F401
    load_events_micros,
    normalize_ts_micros,
    read_events_raw,
    ts_micros_expr,
)
from .files import poj_directory_source, source_lines_from_files  # noqa: F401
from .jsonl import (  # noqa: F401
    DOCUMENT_SCHEMA,
    corrupt_line_count,
    read_jsonl,
    write_jsonl,
)
from .index import (  # noqa: F401
    index_exists,
    load_index,
    load_quantized_index,
    write_index,
    write_quantized_index,
)
