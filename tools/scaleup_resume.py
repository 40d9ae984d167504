#!/usr/bin/env python3
"""Resume a partially-written scaleup run: re-clone only the tables
named on the command line, with the same fidelity rules as scaleup.py
(see its module doc). Exists because a full 1000x run can outlive a
driver-imposed subprocess timeout mid-lineitem; each table's COPY is
atomic (DuckDB writes the file in one statement), so resuming per
table is safe.

Usage: python3 tools/scaleup_resume.py <srcDir> <dstDir> <copies> <table> [...]
"""
import sys
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import scaleup as s


def main(src: str, dst: str, n: int, tables: list[str]) -> None:
    import os
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    stop_sql = "[" + ",".join(f"'{w}'" for w in s.STOP) + "]"

    def clone(table: str, select: str) -> None:
        q = (f"COPY (SELECT {select} FROM read_parquet('{src}/{table}.parquet') t, "
             f"range({n}) c(i) ORDER BY c.i) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        con.execute(q)
        print(f"[scaleup] {table}: x{n}", flush=True)

    for t in tables:
        if t in ("region", "nation"):
            con.execute(f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
                        f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
            print(f"[scaleup] {t}: single copy (closed key domain)", flush=True)
        elif t == "customer":
            clone("customer",
                  f"c_custkey + c.i*{s.CUST} AS c_custkey, c_name, c_nationkey, "
                  f"c_acctbal, c_mktsegment")
        elif t == "supplier":
            clone("supplier",
                  f"s_suppkey + c.i*{s.SUPP} AS s_suppkey, s_name, s_nationkey, s_acctbal")
        elif t == "part":
            clone("part",
                  f"p_partkey + c.i*{s.PART} AS p_partkey, p_name, p_brand, p_type, "
                  f"p_size, p_retailprice")
        elif t == "orders":
            clone("orders",
                  f"o_orderkey + c.i*{s.ORD} AS o_orderkey, o_custkey + c.i*{s.CUST} AS o_custkey, "
                  f"o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
        elif t == "lineitem":
            clone("lineitem",
                  f"l_orderkey + c.i*{s.ORD} AS l_orderkey, l_partkey + c.i*{s.PART} AS l_partkey, "
                  f"l_suppkey + c.i*{s.SUPP} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
                  f"l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate")
        elif t == "documents":
            clone("documents",
                  f"doc_id + c.i*{s.DOC} AS doc_id, "
                  f"array_to_string(list_transform(string_split(text, ' '), "
                  f"  w -> CASE WHEN c.i = 0 OR list_contains({stop_sql}, w) THEN w "
                  f"       ELSE w || chr((97 + c.i)::INTEGER) END), ' ') AS text, "
                  f"lang, source, 0::BIGINT AS n_chars")
            con.execute(f"""
                COPY (SELECT doc_id, text, lang, source, length(text)::BIGINT AS n_chars
                      FROM read_parquet('{dst}/documents.parquet'))
                TO '{dst}/documents.tmp.parquet' (FORMAT PARQUET)""")
            import shutil
            shutil.move(f"{dst}/documents.tmp.parquet", f"{dst}/documents.parquet")
        elif t == "embeddings":
            clone("embeddings",
                  f"vec_id + c.i*{s.VEC} AS vec_id, "
                  f"CAST(list_slice(embedding, (7*c.i) % len(embedding) + 1, len(embedding)) "
                  f"  || list_slice(embedding, 1, (7*c.i) % len(embedding)) AS FLOAT[]) AS embedding, "
                  f"label")
        elif t == "events":
            ev = con.execute(
                f"SELECT event_id + c.i*{s.EVT} AS event_id, epoch_ns(ts)::BIGINT AS ts_ns, "
                f"user_id + c.i*{s.USR} AS user_id, event_type, value, props "
                f"FROM read_parquet('{src}/events.parquet') t, range({n}) c(i) ORDER BY c.i"
            ).fetch_arrow_table()
            # identical explicit schema + row-group layout to scaleup.py,
            # so a resumed events.parquet is byte-compatible with a full
            # run (nullability metadata and row-group sizing included)
            schema = pa.schema([
                pa.field("event_id", pa.int64()),
                pa.field("ts", pa.timestamp("ns")),
                pa.field("user_id", pa.int64()),
                pa.field("event_type", pa.string()),
                pa.field("value", pa.float64()),
                pa.field("props", pa.string()),
            ])
            out = pa.table({
                "event_id": ev.column("event_id"),
                "ts": ev.column("ts_ns").cast(pa.timestamp("ns")),
                "user_id": ev.column("user_id"),
                "event_type": ev.column("event_type"),
                "value": ev.column("value"),
                "props": ev.column("props"),
            }, schema=schema)
            pq.write_table(out, f"{dst}/events.parquet",
                           coerce_timestamps=None, row_group_size=200_000)
            print(f"[scaleup] events: x{n} (nanos preserved)", flush=True)
        else:
            raise SystemExit(f"unknown/unsupported resume table {t}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4:])
