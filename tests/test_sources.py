"""Source/sink tests (SURVEY S1-S7, F3, M2)."""

import os

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.sources.csv_io import (
    read_clones_csv,
    read_functions_csv,
    write_results_csv,
)
from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.sources.files import (
    poj_directory_source,
    source_lines_from_files,
)
from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.sources.index import (
    index_exists,
    load_index,
    write_index,
)


def _mk_poj_tree(root):
    for cls, files in {
        "1": {"a.txt": "int main() { return 0; }", "b.txt": "print hello"},
        "2": {"c.txt": "for loop here"},
    }.items():
        d = os.path.join(root, cls)
        os.makedirs(d, exist_ok=True)
        for name, text in files.items():
            with open(os.path.join(d, name), "w") as f:
                f.write(text)
    # non-UTF8 file exercises the charset-tolerant decode (M2)
    with open(os.path.join(root, "2", "latin.txt"), "wb") as f:
        f.write("café résumé".encode("latin-1"))
    # non-matching suffix must be ignored by the glob (S2)
    with open(os.path.join(root, "2", "ignored.md"), "w") as f:
        f.write("not code")


def test_poj_directory_source(spark, tmp_path):
    _mk_poj_tree(str(tmp_path))
    df = poj_directory_source(spark, str(tmp_path))
    rows = {(r.clone_type, r.code_name): r.code_contents for r in df.collect()}
    assert ("1", "a.txt") in rows and rows[("1", "a.txt")] == "int main() { return 0; }"
    assert len(rows) == 4  # .md excluded
    latin = rows[("2", "latin.txt")]
    assert "caf" in latin  # decoded losslessly or lossily, never crashed


def test_source_lines_from_files(spark, tmp_path):
    p = tmp_path / "src"
    p.mkdir()
    (p / "x.java").write_text("line1\nline2\nline3")
    df = source_lines_from_files(spark, str(p))
    rows = sorted((r.line_no, r.line) for r in df.collect())
    assert rows == [(1, "line1"), (2, "line2"), (3, "line3")]


def test_csv_roundtrip(spark, tmp_path):
    clones_path = tmp_path / "CLONES.csv"
    clones_path.write_text(
        "FUNCTION_ID_ONE,FUNCTION_ID_TWO,TYPE\n1,2,3\n2,3,3\n"
    )
    clones = read_clones_csv(spark, str(clones_path))
    assert clones.columns == ["function_id_one", "function_id_two"]
    assert clones.count() == 2

    funcs_path = tmp_path / "FUNCTIONS.csv"
    funcs_path.write_text("ID,NAME,STARTLINE,ENDLINE\n7,f.java,1,5\n")
    funcs = read_functions_csv(spark, str(funcs_path))
    r = funcs.first()
    assert (r.id, r.name, r.startline, r.endline) == (7, "f.java", 1, 5)

    out = tmp_path / "out"
    write_results_csv(clones, str(out))
    back = spark.read.option("header", True).csv(str(out))
    assert back.count() == 2


def test_index_create_if_absent(spark, tmp_path, embeddings):
    path = str(tmp_path / "index")
    assert not index_exists(spark, path)
    write_index(embeddings.limit(10), path)
    assert index_exists(spark, path)
    # mode="ignore" semantics: second write is a no-op (S7 skip-if-exists)
    write_index(embeddings.limit(20), path)
    assert load_index(spark, path).count() == 10
