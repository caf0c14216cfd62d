"""Deterministic scale-up of the driver parquet fixtures for
cross-scale sweeps (VERDICT r04 #7): replicate /root/testdata/sf0.1
`factor` times with id-shifted, content-disjoint copies, so plans that
only look fine at 17 MB get exercised at ~10x before the graded gate.

NOT graded data — the oracle compare runs Spark and DuckDB on the SAME
files, so any deterministic content works; what matters is volume and
key-domain realism:

- events: event_id += k*E (stays far below the M4 2^24 id guard at
  sf1), user_id += k*U (10x user cardinality), same timestamp window
  (hourly buckets get ~10x rows — the continuous-aggregate shape).
- documents: doc_id += k*D; every word of copy k>0 gets suffix `_k`,
  making copies SHINGLE-DISJOINT: per-copy dup/near-dup structure is
  preserved exactly, so pair/cluster counts scale linearly (identical
  copies would instead pair every doc with its 9 twins — a quadratic
  artifact of the generator, not of the data).
- embeddings: vec_id += k*V; each copy's vectors are cyclically rolled
  by k dims (norms preserved, directions distinct — no cross-copy
  cosine ties to stress float tie-breaking in the compare).
- relational facts (r06d+: the TPC-H-topology queries read them):
  customer c_custkey += k*C; orders o_orderkey += k*O with the custkey
  shifted to match; lineitem l_orderkey += k*O (part/supplier keys
  unchanged — those stay dimension tables, copied verbatim).  FK
  structure is preserved per copy, so join cardinalities and per-order
  aggregates scale exactly linearly.
- nation/region/part/supplier are copied verbatim (pure dimensions).

Usage: python tools/make_sf.py --out /tmp/tb_sf1 [--factor 10]
"""

from __future__ import annotations

import argparse
import glob
import os

import duckdb

SRC = "/root/testdata/sf0.1"


def build(out: str, factor: int = 10, src: str = SRC) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    shifts = {"events": ("event_id", 100000), "documents": ("doc_id", 5000)}

    for path in sorted(glob.glob(os.path.join(src, "*.parquet"))):
        t = os.path.basename(path).replace(".parquet", "")
        dst = os.path.join(out, f"{t}.parquet")
        if t == "events":
            parts = []
            for k in range(factor):
                parts.append(f"""
SELECT event_id + {k * 100000} AS event_id, ts,
       user_id + {k * 1500} AS user_id, event_type, value, props
FROM '{path}'""")
            q = " UNION ALL ".join(parts)
        elif t == "documents":
            parts = []
            for k in range(factor):
                text = (
                    "text" if k == 0
                    else f"regexp_replace(text, '(\\S+)', '\\1_{k}', 'g')"
                )
                parts.append(f"""
SELECT doc_id + {k * 5000} AS doc_id, {text} AS text, lang, source,
       CAST(length({text}) AS BIGINT) AS n_chars
FROM '{path}'""")
            q = " UNION ALL ".join(parts)
        elif t == "embeddings":
            parts = []
            for k in range(factor):
                emb = (
                    "embedding" if k == 0
                    else f"list_concat(embedding[{k + 1}:], "
                         f"embedding[:{k}])"
                )
                parts.append(f"""
SELECT vec_id + {k * 2000} AS vec_id, {emb} AS embedding, label
FROM '{path}'""")
            q = " UNION ALL ".join(parts)
        elif t == "customer":
            parts = [
                f"SELECT c_custkey + {k * 15000} AS c_custkey, c_name, "
                f"c_nationkey, c_acctbal, c_mktsegment FROM '{path}'"
                for k in range(factor)
            ]
            q = " UNION ALL ".join(parts)
        elif t == "orders":
            parts = [
                f"SELECT o_orderkey + {k * 150000} AS o_orderkey, "
                f"o_custkey + {k * 15000} AS o_custkey, o_orderstatus, "
                f"o_totalprice, o_orderdate, o_orderpriority FROM '{path}'"
                for k in range(factor)
            ]
            q = " UNION ALL ".join(parts)
        elif t == "lineitem":
            parts = [
                f"SELECT l_orderkey + {k * 150000} AS l_orderkey, "
                f"l_partkey, l_suppkey, l_linenumber, l_quantity, "
                f"l_extendedprice, l_discount, l_tax, l_returnflag, "
                f"l_linestatus, l_shipdate FROM '{path}'"
                for k in range(factor)
            ]
            q = " UNION ALL ".join(parts)
        else:
            q = f"SELECT * FROM '{path}'"
        con.execute(f"COPY ({q}) TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{t}: {n} rows -> {dst}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/tb_sf1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default=SRC)
    args = ap.parse_args()
    build(args.out, args.factor, args.src)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
