"""Ports of the reference's 11 unit tests (tests/data-table.lisp:26-216)
against the DataTable facade — pins reference-parity semantics (SURVEY §5.1).
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import types as T

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_table_spark.core import DataTable  # noqa: E402
from data_table_spark.inference import simplify_type  # noqa: E402
from data_table_spark.names import dedupe_names, resolve_column  # noqa: E402

# F1 employees fixture — mirror of test-data-table (tests/data-table.lisp:15-24)
EMPLOYEE_COLS = ["first name", "last name", "job title", "number of hours", "id"]
EMPLOYEE_ROWS = [
    ["Russ", "Tyndall", "Software Developer", "26.2", "1"],
    ["Adam", "Smith", "Economist", "37.5", "2"],
    ["John", "Doe", "Anonymous Human", "42.1", "3"],
    ["Chuck", "Darwin", "Natural Philosipher", "17.68", "4"],
    ["Bill", "Shakespear", "Bard", "12.2", "5"],
    ["James", "Kirk", "Starship Captain", "13.1", "6"],
]


@pytest.fixture()
def employees(spark):
    return DataTable.from_rows(spark, EMPLOYEE_ROWS, EMPLOYEE_COLS)


def test_data_table_types(employees):
    """tests/data-table.lisp:26-40 — inference yields
    (string string string double-float integer)."""
    dt = employees.coerce_types()
    types = dt.column_types
    assert isinstance(types[0], T.StringType)
    assert isinstance(types[1], T.StringType)
    assert isinstance(types[2], T.StringType)
    assert isinstance(types[3], T.DoubleType)
    assert isinstance(types[4], T.LongType)
    # every cell satisfies its column type
    rows = dt.rows()
    for r in rows:
        assert isinstance(r[3], float)
        assert isinstance(r[4], int)
    assert rows[0][3] == 26.2 and rows[0][4] == 1


def test_data_table_value_manip(employees):
    """tests/data-table.lisp:42-53 — add-column at index 1; a short
    column-set writes exactly len(values) cells (the just-added column is
    all-NULL, so trailing rows read NULL)."""
    dt = employees.add_column("middle name", None, T.StringType(), index=1)
    assert dt.column_names[1] == "middle name"
    assert dt.number_of_columns == 6
    dt2 = dt.set_value(["Q", "R", "S", "T"], col="middle name")
    col = dt2.value(col="middle name")
    assert col == ["Q", "R", "S", "T", None, None]
    # other columns untouched
    assert dt2.value(col="first name") == [r[0] for r in EMPLOYEE_ROWS]


def test_column_set_keeps_trailing_values_and_extends(employees):
    """(setf data-table-value) col branch iterates exactly len(values)
    cell-sets (data-table.lisp:166-170): rows beyond the list KEEP their
    values; a list longer than the table auto-extends it via ensure-rows
    (round-2 advisor finding — the old implementation NULLed trailing rows
    and truncated long lists)."""
    # shorter list: trailing rows keep their existing first names
    dt = employees.set_value(["X", "Y"], col="first name")
    assert dt.value(col="first name") == ["X", "Y", "John", "Chuck", "Bill", "James"]
    # longer list: table grows, other columns pad with NULL
    seven = ["A", "B", "C", "D", "E", "F", "G"]
    dt2 = employees.set_value(seven, col="first name")
    assert dt2.number_of_rows == 7
    assert dt2.value(col="first name") == seven
    assert dt2.value(row_idx=6, col="last name") is None


def test_overlay_explicit_null_and_type_conflict(spark):
    """overlay-region assigns every overlay cell unconditionally
    (data-table.lisp:234-238): an explicit NULL in the overlay block must
    overwrite, and pasting strings over a typed column demotes it to
    string instead of silently keeping old cells (round-2 advisor
    finding)."""
    base = DataTable.from_rows(spark, [["a", "b"], ["c", "d"]])
    block = DataTable.from_rows(spark, [[None, "z"]])
    out = base.overlay_region(block, 0, 0)
    rows = out.rows()
    assert rows[0] == [None, "z"]
    assert rows[1] == ["c", "d"]
    # type conflict: string block over long column → column reads back
    # as strings, values overwritten
    typed = DataTable.from_records(
        spark, [{"n": 1, "s": "x"}, {"n": 2, "s": "y"}]
    )
    sblock = DataTable.from_rows(spark, [["ten"]])
    out2 = typed.overlay_region(sblock, 0, 0)
    assert out2.value(col="n") == ["ten", "2"]


def test_cell_and_row_set_type_demotion(spark):
    """Single-cell and whole-row set_value must demote a type-mismatched
    column to string (the untyped-cell model) instead of raising — the
    same semantics the column-list and overlay paths already have
    (round-2 advisor finding). Numeric-into-numeric stays numeric."""
    t = DataTable.from_records(spark, [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}])
    # string into bigint cell: demote, both cells readable
    t2 = t.set_value("oops", row_idx=1, col="a")
    assert t2.value(col="a") == ["1", "oops"]
    # whole-row set with a mismatched first column
    t3 = t.set_value(["zz", 7], row_idx=0)
    assert t3.value(row_idx=0) == ["zz", "7"]
    # numeric widening keeps a numeric column
    t4 = t.set_value(2.5, row_idx=0, col="a")
    assert t4.value(col="a") == [2.5, 2.0]
    assert "string" not in str(t4.column_types[t4.column_index("a")]).lower()
    # NULL assignment never demotes
    t5 = t.set_value(None, row_idx=0, col="a")
    assert t5.value(0, "a") is None
    assert "string" not in str(t5.column_types[t5.column_index("a")]).lower()


def test_data_table_value_manip2(employees):
    """tests/data-table.lisp:55-60 — cell set/get; row length invariant."""
    dt = employees.set_value("Russell", row_idx=0, col="first name")
    assert dt.value(row_idx=0, col="first name") == "Russell"
    assert dt.value(row_idx=1, col="first name") == "Adam"
    row = dt.value(row_idx=0)
    assert len(row) == 5


def test_data_table_value_overlaying(spark):
    """tests/data-table.lisp:62-100 — 4 overlays onto an empty table
    auto-grow it to 5×5; row 3 = (1,'2','c','d',2) after typing."""
    block_ab = DataTable.from_rows(spark, [["a", "b"], ["c", "d"]])
    block_12 = DataTable.from_rows(spark, [["1", "2"], ["3", "4"]])
    empty = DataTable.from_rows(spark, [], [])
    dt = empty.overlay_region(block_ab, 1, 1)
    dt = dt.overlay_region(block_12, 3, 3)
    dt = dt.overlay_region(block_ab, 2, 2)
    dt = dt.overlay_region(block_12, 3, 0)
    assert dt.number_of_columns == 5
    assert dt.number_of_rows == 5
    rows = dt.rows()
    # expected grid (tests/data-table.lisp:85-89)
    assert rows[1][1] == "a" and rows[1][2] == "b"
    assert rows[2][2] == "a" and rows[2][3] == "b"
    assert rows[3][0] == "1" and rows[3][1] == "2"
    assert rows[3][2] == "c" and rows[3][3] == "d" and rows[3][4] == "2"
    assert rows[4][0] == "3" and rows[4][1] == "4"
    # post-overlay inference (tests/data-table.lisp:96-99):
    typed = dt.coerce_types(infer_dates=False)
    tps = typed.column_types
    assert isinstance(tps[0], T.LongType)
    assert isinstance(tps[1], T.StringType)
    assert isinstance(tps[2], T.StringType)
    assert isinstance(tps[3], T.StringType)
    assert isinstance(tps[4], T.LongType)
    assert typed.rows()[3] == [1, "2", "c", "d", 2]


def test_data_table_subtables(spark, employees):
    """tests/data-table.lisp:102-125 — column-range slices keep
    names/types/data (F3 wide_six fixture)."""
    wide = DataTable.from_rows(
        spark,
        [[1, 2, 3, "a", "b", "c"], [3, 4, 5, "d", "e", "f"], [6, 7, 8, "g", "h", "i"]],
        ["i", "j", "k", "x", "y", "z"],
    )
    left = wide.sub_table(lci=0, uci=3)
    right = wide.sub_table(lci=3, uci=6)
    assert left.column_names == ["i", "j", "k"]
    assert right.column_names == ["x", "y", "z"]
    assert left.rows() == [[1, 2, 3], [3, 4, 5], [6, 7, 8]]
    assert right.rows() == [["a", "b", "c"], ["d", "e", "f"], ["g", "h", "i"]]
    expected = DataTable.from_rows(
        spark, [[1, 2, 3], [3, 4, 5], [6, 7, 8]], ["i", "j", "k"]
    )
    assert left.compare(expected)
    # row slicing too
    mid = wide.sub_table(lri=1, uri=3)
    assert mid.rows() == [[3, 4, 5, "d", "e", "f"], [6, 7, 8, "g", "h", "i"]]


def test_data_table_alist(spark):
    """tests/data-table.lisp:127-147 — records round-trip; keys from first
    record; stray key 'd' dropped (F4 fixture)."""
    records = [
        {"a": 1, "b": 2, "c": 3},
        {"b": 4, "a": 5, "c": 6, "d": "not-in-data-table"},
        {"c": 9, "a": 8, "b": 7},
        {"b": 10, "c": 11, "a": 12},
    ]
    dt = DataTable.from_records(spark, records)
    assert dt.column_names == ["a", "b", "c"]
    assert dt.value(col="b") == [2, 4, 7, 10]
    back = dt.to_records()
    assert back[0] == {"a": 1, "b": 2, "c": 3}
    assert all(list(r.keys()) == ["a", "b", "c"] for r in back)


def test_data_table_plist(spark):
    """tests/data-table.lisp:149-169 — same semantics from plist-style input."""
    records = [
        {"a": 1, "b": 2, "c": 3},
        {"a": 5, "b": 4, "c": 6, "d": "x"},
    ]
    dt = DataTable.from_records(spark, records)
    assert dt.column_names == ["a", "b", "c"]
    assert dt.rows() == [[1, 2, 3], [5, 4, 6]]


def test_data_table_select_columns(employees):
    """tests/data-table.lisp:171-189 — projection by name reorders data;
    case-insensitive resolution."""
    sel = employees.select_columns(["id", "first name"])
    assert sel.column_names == ["id", "first name"]
    assert sel.number_of_rows == 6
    assert sel.rows()[0] == ["1", "Russ"]
    sel2 = employees.select_columns(["ID", "First Name"])
    assert sel2.rows() == sel.rows()
    with pytest.raises(KeyError):
        employees.select_columns(["nope"])


def test_data_table_sample_rows(employees):
    """tests/data-table.lisp:191-197 — sample size honored; sampled rows ∈
    original (our inference samples via limit(n))."""
    df = employees.df.limit(3)
    rows = [list(r) for r in df.collect()]
    assert len(rows) == 3
    orig = employees.rows()
    for r in rows:
        assert r in orig


def test_data_table_simplify_types():
    """tests/data-table.lisp:199-206 — value-type table incl. ±2^63 edges
    (simplify-types, data-table.lisp:266-280)."""
    assert simplify_type(1) == "integer"
    assert simplify_type(2**62) == "integer"
    assert simplify_type(2**63 - 1) == "integer"
    assert simplify_type(2**63) == "string"
    assert simplify_type(2**63 + 1) == "string"
    assert simplify_type(-(2**63)) == "string"
    assert simplify_type(1.5) == "double-float"
    assert simplify_type("x") == "string"


def test_data_table_column_index(employees):
    """tests/data-table.lisp:208-216 — name/symbol/int resolution incl.
    after symbolize."""
    cols = employees.column_names
    assert resolve_column(cols, "first name") == 0
    assert resolve_column(cols, "First Name") == 0
    assert resolve_column(cols, "first-name") == 0  # symbol-style
    assert resolve_column(cols, 4) == 4
    assert resolve_column(cols, "id") == 4
    sym = employees.symbolize_column_names()
    assert sym.column_names == [
        "first-name", "last-name", "job-title", "number-of-hours", "id",
    ]
    assert resolve_column(sym.column_names, "first name") == 0


def test_dedupe_columns():
    """F7 fixture (clsql-data-table.lisp:145-181) — suffix-all policy."""
    got = dedupe_names(["amount", "amount", "name", "amount", "name"])
    assert got == ["amount", "amount_1", "name", "amount_2", "name_1"]


def test_ragged_rows(spark):
    """F8 fixture (fill-in-missing-cells, data-table.lisp:240-264) —
    rows of lengths (2,4,3) with 2 declared names → 3×4 table."""
    dt = DataTable.from_rows(
        spark,
        [["a", "b"], ["c", "d", "e", "f"], ["g", "h", "i"]],
        ["x", "y"],
    )
    assert dt.number_of_columns == 4
    assert dt.column_names == ["x", "y", "col_2", "col_3"]
    assert dt.rows() == [
        ["a", "b", None, None],
        ["c", "d", "e", "f"],
        ["g", "h", "i", None],
    ]


def test_render_formats(employees):
    """R22-R23 output-type dispatch: '%.2f' doubles, '' nulls, csv/html
    renderers (coerce-value-for-output, data-table.lisp:437-469)."""
    typed = employees.coerce_types(infer_dates=False)
    s = typed.render("string")
    assert "26.20\t1" in s.replace("26.20", "26.20")  # %.2f + tab layout
    lines = s.splitlines()
    assert lines[0].split("\t") == typed.column_names
    assert lines[1].endswith("26.20\t1")
    csv_text = typed.render("csv")
    assert csv_text.splitlines()[1].endswith("26.20,1")
    html = typed.render("html")
    assert html.startswith("<table>") and "<td>26.20</td>" in html
    import pytest as _pytest
    with _pytest.raises(ValueError):
        typed.render("nope")


def test_reservoir_sampling_mode(spark):
    """R15 parity: reservoir mode sees rows beyond the head — a table whose
    first 1000 rows are integers but later rows are strings infers LONG
    under head sampling and STRING under reservoir sampling."""
    from data_table_spark.inference import guess_types

    rows = [(str(i),) for i in range(2000)] + [("not a number",)] * 500
    df = spark.createDataFrame(rows, ["v"]).coalesce(1)
    head = guess_types(df, sample_size=1000, sample_mode="head")
    res = guess_types(df, sample_size=1000, sample_mode="reservoir")
    assert head["v"].simpleString() == "bigint"     # head-biased
    assert res["v"].simpleString() == "string"      # reservoir sees the tail


def test_nbsp_grouped_integers_infer_long(spark):
    """Inference and coercion strip the same junk class as relaxed parsing
    (_NUMERIC_JUNK, NBSP included): '1\\u00a0000'-style NBSP-grouped
    integers infer and coerce as LONG, not DOUBLE (round-2 advisor
    finding — the re-spelled ASCII-only class diverged)."""
    from data_table_spark.inference import guess_types

    rows = [("1 000",), ("2 500",), ("10 000",)]
    df = spark.createDataFrame(rows, ["v"])
    assert guess_types(df)["v"].simpleString() == "bigint"
    dt = DataTable(df).coerce_types()
    assert dt.value(col="v") == [1000, 2500, 10000]


def test_coerce_accepts_ddl_string_specs(spark):
    """Explicit type specs given as DDL strings ("bigint") behave
    identically to DataType instances on every path — including the
    on_error='raise' path, which previously crashed formatting the
    BadTypeGuess message (str has no .simpleString)."""
    import pytest

    from data_table_spark.inference import BadTypeGuess

    df = spark.createDataFrame([("12",), ("oops",)], ["v"])
    dt = DataTable(df)
    with pytest.raises(BadTypeGuess):
        dt.coerce_types(explicit={"v": "bigint"}, on_error="raise")
    fallback = dt.coerce_types(explicit={"v": "bigint"}, on_error="string")
    assert fallback.column_type("v").simpleString() == "string"
    clean = DataTable(spark.createDataFrame([("1 000",), ("2",)], ["v"]))
    typed = clean.coerce_types(explicit={"v": "bigint"}, on_error="raise")
    assert typed.column_type("v").simpleString() == "bigint"
    assert typed.value(col="v") == [1000, 2]


def test_row_id_dense_across_partitions(spark, sf_dir):
    """with_row_id must produce a dense 0..n-1 sequence even over a
    multi-partition input (the distributed offsets path)."""
    from pyspark.sql import functions as F

    from data_table_spark.core import with_row_id

    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet").repartition(16)
    ids = with_row_id(df)
    n = df.count()
    stats = ids.agg(
        F.count("_row_id").alias("cnt"),
        F.countDistinct("_row_id").alias("nd"),
        F.min("_row_id").alias("lo"),
        F.max("_row_id").alias("hi"),
    ).collect()[0]
    assert stats["cnt"] == n
    assert stats["nd"] == n          # unique
    assert stats["lo"] == 0
    assert stats["hi"] == n - 1      # dense


def test_sql_defined_functions(spark):
    """§4.3.5: reference scalars usable from spark.sql text with no
    Python UDF — SQL-defined functions inline into the Catalyst plan and
    agree with their Column-expression twins."""
    from pyspark.sql import functions as F

    from data_table_spark.functions.cleaning import relaxed_double, trim_and_nullify
    from data_table_spark.functions.sql_functions import register_reference_functions

    names = register_reference_functions(spark)
    assert set(names) == {
        "dt_trim_nullify", "dt_relaxed_double", "dt_relaxed_bigint", "dt_fmt2",
    }
    got = spark.sql("""
        SELECT dt_trim_nullify('  a  ') a, dt_trim_nullify('NIL') b,
               dt_relaxed_double('$1,000.50') c, dt_relaxed_double('abc') d,
               dt_relaxed_bigint(' 42 ') e, dt_relaxed_bigint('1.5') f,
               dt_fmt2(26.2) g, dt_fmt2(NULL) h, dt_fmt2(1234.567) i
    """).collect()[0]
    assert tuple(got) == ("a", None, 1000.5, None, 42, None, "26.20", "", "1234.57")
    # equivalence with the Column twins on a sampled column
    df = spark.createDataFrame([(" 1,5%",), ("nil",), ("$2.50",)], ["s"])
    df.createOrReplaceTempView("sqlfn_t")
    via_sql = spark.sql(
        "SELECT dt_relaxed_double(dt_trim_nullify(s)) v FROM sqlfn_t"
    ).collect()
    via_col = df.select(relaxed_double(trim_and_nullify("s")).alias("v")).collect()
    assert [r["v"] for r in via_sql] == [r["v"] for r in via_col]


def test_facade_csv_and_sinks(spark, tmp_path):
    """from_csv → typed facade → parquet round-trip keeps data + types."""
    from data_table_spark.core import DataTable

    p = tmp_path / "t.csv"
    p.write_text("name,qty\nax,\"$1,000.50\"\nbx,nil\n")
    dt = DataTable.from_csv(spark, str(p))
    assert [t.simpleString() for t in dt.column_types] == ["string", "double"]
    out = str(tmp_path / "t.parquet")
    dt.write_parquet(out)
    back = spark.read.parquet(out)
    assert dict(back.dtypes) == {"name": "string", "qty": "double"}
    assert sorted(map(tuple, back.collect())) == [("ax", 1000.5), ("bx", None)]


def test_coerce_rejects_unknown_on_error_policy(spark):
    """The restart-name set is closed (lisp:398-404): an unknown
    on_error must raise, not silently behave like lenient 'null'."""
    import pytest

    df = spark.createDataFrame([("12",), ("oops",)], ["v"])
    with pytest.raises(ValueError, match="on_error"):
        DataTable(df).coerce_types(
            explicit={"v": "bigint"}, on_error="string-fallback"
        )


def test_arrow_round_trip(spark):
    """to_arrow/from_arrow: the columnar interchange surface must
    round-trip rows, order, names (incl. duplicate-name dedup on
    ingest), and survive mixed nulls."""
    import pyarrow as pa

    from data_table_spark.core import DataTable

    t = DataTable.from_records(
        spark,
        [
            {"a": 1, "b": "x"},
            {"a": None, "b": "y"},
            {"a": 3, "b": None},
        ],
    )
    at = t.to_arrow()
    assert at.column_names == ["a", "b"]
    assert at.num_rows == 3
    back = DataTable.from_arrow(spark, at)
    assert back.rows() == t.rows()
    # duplicate Arrow names follow the standard dedup policy
    dup = pa.table({"x": [1, 2]}).append_column("x_", pa.array([3, 4]))
    dup = dup.rename_columns(["A", "A"])
    d = DataTable.from_arrow(spark, dup)
    assert d.column_names == ["A", "A_1"]
    assert d.rows() == [[1, 3], [2, 4]]


def test_from_records_case_colliding_keys_keep_values(spark):
    """Keys that collide case-insensitively ("Name"/"name") are deduped
    to "Name"/"name_1" — but values must still be fetched with the keys
    AS GIVEN. The old order deduped first and fetched r.get("name_1"),
    which no record contains: the column silently emptied and the
    all-NULL column made createDataFrame's inference throw."""
    t = DataTable.from_records(spark, [{"Name": "x", "name": "y"}])
    assert t.column_names == ["Name", "name_1"]
    assert t.rows() == [["x", "y"]]
    # case-insensitive lookup resolves the first (reference string-equal)
    assert t.column_index("NAME") == 0


def test_from_records_all_null_column_demotes_to_string(spark):
    """An all-NULL column has no inferable type; like from_rows, the
    table demotes to strings (untyped-cell model) instead of raising,
    recoverable via coerce_types()."""
    t = DataTable.from_records(spark, [{"a": None, "b": 1}, {"a": None, "b": 2}])
    assert t.rows() == [[None, "1"], [None, "2"]]
    assert [str(x) for x in t.column_types] == ["StringType()", "StringType()"]
