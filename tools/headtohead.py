#!/usr/bin/env python3
"""Per-query DuckDB-vs-Spark head-to-head on the full oracle surface.

DuckDB (the reference-equivalent single-node engine) runs every oracle
SQL from oracle_sql.json against the same parquet tables, timed
best-of-N; Spark per-query timings come from a Bench JSON line. Output
is the markdown table SURVEY §7 embeds.

Usage:
  python3 tools/headtohead.py <sfDir> <oracle_sql.json> <bench.jsonl> [runs]

Caveat printed with the table: oracle SQL for the verification-heavy
gates (q_dedup_minhash, q_ann_lsh, ...) recomputes strictly more than
the operator (exact pair enumeration, full pipeline replays), so those
rows overstate DuckDB cost; the headline comparison is the median
per-query ratio over the simple-aggregate rows, not the total.
"""
import sys, json, time
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def main(sf_dir, oracle_path, bench_path, runs=2):
    con = duckdb.connect()
    con.execute("PRAGMA threads=32")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(oracle_path))
    line = open(bench_path).readline()
    bench = json.loads(line[line.index("{"):])  # tolerate sbt's [info] prefix
    spark_times = bench["queries"]
    rows = []
    for name, sql in sorted(oracles.items()):
        best = None
        err = None
        for _ in range(runs):
            t0 = time.time()
            try:
                con.execute(sql).fetchall()
            except Exception as e:
                err = str(e).splitlines()[0][:80]
                break
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        rows.append((name, spark_times.get(name), best, err))
    print(f"| query | spark s | duckdb s | ratio s/d |")
    print(f"|---|---|---|---|")
    ratios = []
    s_tot = d_tot = 0.0
    for name, s, d, err in sorted(rows, key=lambda r: -(r[1] or 0)):
        if err:
            print(f"| {name} | {s:.2f} | ERR {err} | — |")
            continue
        if s is None or s < 0:
            print(f"| {name} | ERR | {d:.2f} | — |")
            continue
        ratio = s / d if d > 0 else float("inf")
        ratios.append(ratio)
        s_tot += s; d_tot += d
        print(f"| {name} | {s:.2f} | {d:.2f} | {ratio:.2f} |")
    ratios.sort()
    med = ratios[len(ratios)//2] if ratios else float("nan")
    print()
    print(f"totals: spark {s_tot:.2f} s, duckdb {d_tot:.2f} s, "
          f"total ratio {s_tot/d_tot:.2f}, median per-query ratio {med:.2f}, "
          f"n={len(ratios)}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3],
         int(sys.argv[4]) if len(sys.argv) > 4 else 2)
