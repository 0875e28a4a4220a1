"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB at the given sf, compare row count,
column names, and order-insensitive value hash."""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_norm(row[i]) for i in order) for row in rows
    )
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


def _norm(v):
    if v is None:
        return "\x00"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return f"{v:.6g}"
    return str(v)


def main():
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        df = fn(spark, SF_DIR)
        cols = df.columns
        rows = [tuple(r) for r in df.collect()]
        if name not in oracles:
            print(f"{name}: rows-only check — {len(rows)} rows, cols={cols}")
            assert len(rows) >= 0
            continue
        ores = con.execute(oracles[name])
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        ok_count = len(rows) == len(orows)
        ok_cols = sorted(cols) == sorted(ocols)
        ok_hash = value_hash(rows, cols) == value_hash(orows, ocols)
        status = "OK" if (ok_count and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name}: {status} rows={len(rows)}/{len(orows)} "
            f"cols={'ok' if ok_cols else (cols, ocols)} hash={'ok' if ok_hash else 'MISMATCH'}"
        )
        if not ok_hash and ok_count and rows and orows:
            sr = sorted(rows)
            so = sorted(orows)
            for a, b in zip(sr, so):
                if tuple(map(_norm, a)) != tuple(map(_norm, b)):
                    print("  spark :", a)
                    print("  oracle:", b)
                    break
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
