"""MinHash-LSH quality on the shingle unit: the banded candidates must
(1) recall nearly all truly-near-duplicate pairs and (2) prune the
candidate space by orders of magnitude — both sides of the LSH tradeoff
(VERDICT r2 #4 style, for the document path)."""

import duckdb
import pytest

from sits_spark.queries import doc_minhash_lsh

SF_DIR = "/root/testdata/sf0.01"

_TRUE_J = """
WITH toks AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS w
              FROM read_parquet('{sf}/documents.parquet')),
sh AS (SELECT DISTINCT doc_id, s FROM toks,
  UNNEST(list_transform(generate_series(1, len(w) - 2),
         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS t(s)),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
pairs AS (SELECT a.doc_id da, b.doc_id db, count(*) AS common
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT da, db FROM pairs
JOIN sz sa ON da = sa.doc_id JOIN sz sb ON db = sb.doc_id
WHERE common * 1.0 / (sa.n + sb.n - common) >= 0.9
"""


def test_minhash_recalls_near_dups_and_prunes(spark):
    true_pairs = {
        (a, b) for a, b in duckdb.sql(_TRUE_J.format(sf=SF_DIR)).fetchall()
    }
    assert len(true_pairs) >= 10  # the corpus has planted near-dups
    cand = {
        (r.doc_a, r.doc_b) for r in doc_minhash_lsh(spark, SF_DIR).collect()
    }
    recall = len(true_pairs & cand) / len(true_pairs)
    # 4 bands x 4 rows: P(catch | J=0.9) = 1-(1-0.9^4)^4 ~ 0.986
    assert recall >= 0.8, recall
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchone()[0]
    all_pairs = n_docs * (n_docs - 1) / 2
    assert len(cand) / all_pairs < 0.05, len(cand)
