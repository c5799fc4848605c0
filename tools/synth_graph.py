#!/usr/bin/env python3
"""Synthesize an EDGE-COUNT scale axis for the iterative graph kernels.

Replays the q30 co-purchase derivation (distinct customer-part incidence
-> shared-part pair count >= 3) on sf0.1 in DuckDB, then replicates the
edge relation K times with vertex offsets — K disjoint relabeled copies of
the sf0.1 graph, which is EXACTLY the graph the table-replication fixtures
(tools/synth_scale.py) induce (replica id spaces are disjoint, so the
co-purchase pair join never crosses replicas), minus the hours-long pair
join at the 1000x fixture. Edge count is the iterative family's true cost
axis; tools/GraphScale.scala consumes the output.

Usage: python3 tools/synth_graph.py <K> <outParquet>
  e.g. python3 tools/synth_graph.py 100  /tmp/gedges_100x
       python3 tools/synth_graph.py 1000 /tmp/gedges_1000x
"""
import sys
import duckdb

SRC = "/root/testdata/sf0.1"


def main(k, out):
    con = duckdb.connect()
    con.execute("PRAGMA threads=32")
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{SRC}/lineitem.parquet'")
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SRC}/orders.parquet'")
    con.execute("""
        CREATE TEMP TABLE e AS
        WITH inc AS (
          SELECT DISTINCT o_custkey AS c, l_partkey AS p
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        SELECT a.c AS u, b.c AS v
        FROM inc a JOIN inc b ON a.p = b.p AND a.c < b.c
        GROUP BY 1, 2 HAVING count(*) >= 3""")
    (base,) = con.execute("SELECT count(*) FROM e").fetchone()
    (stride,) = con.execute("SELECT max(v) + 1 FROM e").fetchone()
    con.execute(f"""
        COPY (SELECT u + r.i * {stride} AS u, v + r.i * {stride} AS v
              FROM e, range({k}) r(i))
        TO '{out}' (FORMAT PARQUET, COMPRESSION ZSTD)""")
    print(f"edges {base} x {k} = {base * k} (vertex stride {stride}) -> {out}")


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2])
