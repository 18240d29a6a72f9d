"""Driver-contract regression guards: the queries()/oracle_sql() registry
shape the correctness gate depends on."""

import inspect


def test_every_oracle_has_a_query():
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)


def test_no_oracle_set_is_empty():
    """EVERY registered query carries an exact-hash oracle — including the
    approximate-sketch family (their plans compute the exact twin alongside
    the sketch and emit a `within_tol` boolean the DuckDB twin pins to
    TRUE) and iterative BPE (6 rounds unrolled into chained DuckDB CTEs).
    A new query registered without an oracle should fail here, not silently
    weaken the correctness gate."""
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert set(q) - set(o) == set()


def test_query_callables_take_spark_and_sfdir():
    import __spark_entry__ as e

    for name, fn in e.queries().items():
        params = list(inspect.signature(fn).parameters)
        assert len(params) == 2, f"{name} must take (spark, sf_dir)"


def test_first_fifty_are_all_oracle_checked():
    """The driver records only the first 50 registered queries; every one
    of them must carry an exact oracle (no rows-only entries burning a
    recorded slot)."""
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    first = list(q)[:50]
    assert all(n in o for n in first)


def test_no_oracle_yields_banned_duckdb_types():
    """DESCRIBE every oracle in DuckDB and assert no HUGEINT/UHUGEINT final
    column: DuckDB types an un-cast integer SUM as int128, which exports as
    decimal128/float64 through Arrow/pandas and hash-mismatches Spark's
    BIGINT in the driver's typed compare (the q12_late_shipments r2 red
    row).  DESCRIBE only plans the query, so this sweep is cheap."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from tools.check_oracle import duck_con, oracle_type_violations

    con = duck_con("/root/testdata/sf0.001")
    bad = {}
    for name, sql in e.oracle_sql().items():
        viol = oracle_type_violations(con, sql)
        if viol:
            bad[name] = viol
    assert not bad, f"oracles with HUGEINT-family result columns: {bad}"


def test_bench_names_resolve():
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from bench import BENCH_QUERIES, STREAMING_EXTRA_QUERIES

    q = e.queries()
    both = BENCH_QUERIES + STREAMING_EXTRA_QUERIES
    assert all(n in q for n in both)
    assert len(set(both)) == len(both)


def test_bench_covers_every_registered_query():
    """r2 verdict task: every registered query is benched — batch queries
    in the headline list, streaming demos under the separate budget line.
    A new query registered without a bench entry fails here."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from bench import BENCH_QUERIES, STREAMING_EXTRA_QUERIES

    unbenched = set(e.queries()) - set(BENCH_QUERIES) - set(STREAMING_EXTRA_QUERIES)
    assert not unbenched, f"queries missing a bench entry: {sorted(unbenched)}"


def test_noise_class_names_are_benched_batch_queries():
    """The 3x-median noise class must name real headline-batch entries —
    a renamed query would silently fall back to single-shot timing."""
    import sys

    sys.path.insert(0, "/root/repo")
    from bench import BENCH_QUERIES, NOISE_CLASS

    assert NOISE_CLASS <= set(BENCH_QUERIES)


def test_query_order_rotates_by_recorded_history():
    """The driver records the FIRST 50 queries; ordering must put
    never-recorded (oracle-backed first) ahead of already-recorded ones,
    derived from the committed CORRECTNESS_r*.json history."""
    import json
    from pathlib import Path

    from kiara_spark.queries import ORACLE, QUERIES, _recorded_counts

    counts = _recorded_counts()
    # sanity: the helper reads the committed files
    root = Path(__file__).resolve().parent.parent
    files = sorted(root.glob("CORRECTNESS_r*.json"))
    assert files, "committed correctness history expected"
    rec_any = set()
    for p in files:
        doc = json.loads(p.read_text())
        rec_any |= set(doc.get("queries", doc))
    assert rec_any <= set(counts) and all(counts[n] >= 1 for n in rec_any)
    # ordering invariant: oracle-less sketch queries sort last
    # unconditionally (they must never burn one of the driver's 50
    # recorded slots), and within the oracle-backed block counts are
    # non-decreasing (fewest-recorded first → the sample rotates).
    from kiara_spark.queries import _PIN_FIRST

    names = list(QUERIES)
    # r10: explicitly pinned queries sit at the head ahead of the
    # count-ordered block (their only driver rows were r04 comparator
    # crashes); the rotation invariant applies to everything after them
    assert names[:len(_PIN_FIRST)] == list(_PIN_FIRST)
    rest = names[len(_PIN_FIRST):]
    keys = [(n not in ORACLE, counts.get(n, 0)) for n in rest]
    assert keys == sorted(keys), "queries not ordered by (oracle, recorded)"
    first50 = names[:50]
    assert all(n in ORACLE for n in first50)
    # every never-recorded oracle-backed query sits ahead of any recorded
    # one (pins excluded: they are recorded by definition)
    oracle_names = [n for n in rest if n in ORACLE]
    unrecorded = [n for n in oracle_names if counts.get(n, 0) == 0]
    if unrecorded:
        last_unrec = max(oracle_names.index(n) for n in unrecorded)
        first_rec = min((oracle_names.index(n) for n in oracle_names
                         if counts.get(n, 0) > 0), default=len(oracle_names))
        assert last_unrec < first_rec


def test_battery_outputs_are_scalar_typed(spark):
    """Battery output contract (r10 verdict item 1): every queries() entry
    must emit only scalar-typed columns — the driver's comparator
    canonicalizes with pandas sort_values, which crashes on array/map/
    struct cells (TypeError: unhashable type 'numpy.ndarray'; the
    embedding_pq_codes red rows of r04/r10).  Walking the registry at
    sf0.001 builds each plan (cheap — no result collection beyond the
    bounded plan-literal collects some builders do) and checks the output
    schema, so any future complex-typed query fails here instead of
    recording an unverifiable driver row."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    bad = {}
    for name, fn in e.queries().items():
        df = fn(spark, sf)
        complex_cols = [f"{f.name}:{f.dataType.simpleString()}"
                        for f in df.schema.fields
                        if isinstance(f.dataType,
                                      (ArrayType, MapType, StructType))]
        if complex_cols:
            bad[name] = complex_cols
    assert not bad, f"complex-typed battery outputs: {bad}"


def test_every_operation_module_type_is_instantiable(ctx):
    """Every registered Operation must point at a module type the
    ModuleRegistry can actually create — a module class defined but never
    appended to its file's MODULES list resolves as an operation yet
    fails at run time (the round-7 events.sequence_pattern bug class)."""
    reg = ctx.module_registry
    ops = ctx.operation_registry
    ids = (ops.operation_ids if hasattr(ops, "operation_ids")
           else ops.list_operations())
    bad = []
    for op_id in ids:
        op = ops.resolve(op_id)
        mt = getattr(op, "module_type", None) or op_id
        if mt not in reg:
            bad.append((op_id, mt))
    assert not bad, f"operations without instantiable modules: {bad}"
