"""corpus_job: the assembled text pipeline conserves every token.

Expectations are computed in DuckDB from the same oracle SQL the driver
gate runs (quality filter, hash split, tokenizer), composed
independently — so the job's quality gate, dedup, split, tokenization,
and packing are cross-engine-checked end to end: per split,
docs/tokens match DuckDB and sequences == ceil(tokens / capacity)."""

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import __spark_entry__ as entrymod
from check_oracle import _duck_con

SF_DIR = "/root/testdata/sf0.001"
CAPACITY = 256


def _expected():
    con = _duck_con(SF_DIR)
    oracles = entrymod.oracle_sql()
    q = f"""
WITH qf AS ({oracles['q_quality_filter']}),
hs AS ({oracles['q_hash_split']}),
tok AS (SELECT doc_id, count(*) AS n
        FROM ({oracles['q_tokenize_vocab']}) GROUP BY doc_id),
d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, md5(text) AS fp
      FROM documents),
kept AS (SELECT doc_id FROM qf WHERE keep = 1),
surv AS (SELECT min(d.doc_id) AS doc_id
         FROM d JOIN kept USING (doc_id) GROUP BY d.fp)
SELECT hs.split, count(*) AS docs, sum(tok.n) AS tokens
FROM surv JOIN hs USING (doc_id) JOIN tok USING (doc_id)
GROUP BY hs.split
"""
    return {r[0]: (int(r[1]), int(r[2])) for r in con.execute(q).fetchall()}


def test_corpus_job_conserves_tokens(spark, tmp_path, capsys):
    import corpus_job

    import tinybrain_spark.session as sess

    out_dir = str(tmp_path / "corpus")
    orig = sess.get_spark
    spark.stop = lambda: None  # CLI calls stop(); keep the fixture alive
    try:
        sess.get_spark = lambda *a, **k: spark
        rc = corpus_job.main([
            "--input", SF_DIR,
            "--output", out_dir,
            "--capacity", str(CAPACITY),
        ])
    finally:
        sess.get_spark = orig
        del spark.stop
    assert rc == 0
    line = [l for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")][-1]
    stats = json.loads(line)

    want = _expected()
    assert set(stats["splits"]) == {"train", "validation", "test"}
    for split, (docs, tokens) in want.items():
        got = stats["splits"][split]
        assert got["docs"] == docs, split
        assert got["tokens"] == tokens, split  # every token exactly once
        assert got["sequences"] == math.ceil(tokens / CAPACITY), split

    # written sequences: all full except the last per split
    for split, (docs, tokens) in want.items():
        rows = sorted(
            spark.read.parquet(os.path.join(out_dir, f"split={split}"))
            .select("seq_id", "n_tok").collect(),
            key=lambda r: r["seq_id"],
        )
        assert [r["seq_id"] for r in rows] == list(range(len(rows)))
        assert all(r["n_tok"] == CAPACITY for r in rows[:-1])
        assert rows[-1]["n_tok"] == tokens - CAPACITY * (len(rows) - 1)
