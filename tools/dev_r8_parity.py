"""Dev harness for the round-8 curate.py entries: runs each candidate
queries() implementation and its draft DuckDB oracle side by side at
sf0.001 and diffs values.  Not part of the test suite."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
import pyspark.sql.functions as F

from neo_server_spark.session import get_spark
from neo_server_spark import io as nio
from neo_server_spark.datapipe import curate

SF = os.environ.get("SF_DIR", "/root/testdata/sf0.001")

spark = get_spark(app_name="r8-dev", master="local[8]", shuffle_partitions=8)
con = duckdb.connect()
for t in ["documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

# Synthetic lines: 8-token chunks, '|'-separated, with deterministic
# terminal punctuation and rule-triggering tokens (same expression in both
# engines).
LINED_SPARK = (
    "array_join(transform(sequence(0, int(ceil(size(__tk) / 8.0)) - 1), j -> "
    "concat(array_join(slice(__tk, j * 8 + 1, 8), ' '), "
    " case when (doc_id + j) % 3 = 1 then '.' "
    "      when (doc_id + j) % 3 = 2 then '?' else '' end, "
    " case when j % 7 = 3 then ' javascript.' else '' end)), '|')")

LINED_DUCK = """
    SELECT doc_id, array_to_string(list_transform(
        generate_series(0, CAST(ceil(len(l) / 8.0) AS INT) - 1), j ->
        array_to_string(l[j*8+1:j*8+8], ' ')
        || CASE WHEN (doc_id + j) % 3 = 1 THEN '.'
                WHEN (doc_id + j) % 3 = 2 THEN '?' ELSE '' END
        || CASE WHEN j % 7 = 3 THEN ' javascript.' ELSE '' END), '|') AS text
    FROM (SELECT doc_id, list_filter(string_split(text, ' '),
                 t -> trim(t) <> '') AS l FROM documents)
"""


def lined_docs():
    docs = nio.load_table(spark, SF, "documents")
    return docs.select(
        "doc_id",
        F.expr("filter(split(text, ' '), t -> t != '')").alias("__tk"),
    ).select("doc_id", F.expr(LINED_SPARK).alias("text"))


def diff(name, sdf, sql):
    s = sdf.toPandas().reset_index(drop=True)
    d = con.sql(sql).df().reset_index(drop=True)
    s = s[sorted(s.columns)]
    d = d[sorted(d.columns)]
    try:
        pd.testing.assert_frame_equal(s, d, check_dtype=False)
        print(f"{name}: OK rows={len(s)}")
    except AssertionError as e:
        print(f"{name}: MISMATCH  spark={len(s)} duck={len(d)}")
        print(str(e)[:1500])
        print("spark head:\n", s.head(5))
        print("duck head:\n", d.head(5))


# ---- c4_filters ----
c4_spark = curate.c4_line_stats(lined_docs(), sep="|").orderBy("doc_id")
c4_sql = f"""
WITH lined AS ({LINED_DUCK}),
base AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, '|'), l -> trim(l)),
                     l -> l <> '') AS lines,
         list_filter(list_transform(string_split(text, '|'), l -> trim(l)), l ->
             l <> ''
             AND (ends_with(l, '.') OR ends_with(l, '!') OR ends_with(l, '?')
                  OR ends_with(l, '"') OR ends_with(l, ''''))
             AND len(list_filter(string_split(l, ' '), w -> w <> '')) >= 5
             AND NOT contains(lower(l), 'javascript')) AS kept,
         lower(text) AS low
  FROM lined
)
SELECT doc_id, len(lines) AS n_lines, len(kept) AS n_kept,
       (CASE WHEN contains(low, 'lorem ipsum') THEN 'lorem_ipsum'
             WHEN contains(low, '{{') THEN 'curly_brace'
             WHEN len(kept) < 3 THEN 'too_few_lines' ELSE '' END) <> ''
         AS doc_removed,
       CASE WHEN contains(low, 'lorem ipsum') THEN 'lorem_ipsum'
            WHEN contains(low, '{{') THEN 'curly_brace'
            WHEN len(kept) < 3 THEN 'too_few_lines' ELSE '' END AS reason
FROM base ORDER BY doc_id
"""
diff("c4_filters", c4_spark, c4_sql)

# ---- line_dedup ----
ld_spark = curate.dedup_lines(lined_docs(), sep="|").orderBy("doc_id")
ld_sql = f"""
WITH lined AS ({LINED_DUCK}),
arrs AS (
  SELECT doc_id, list_filter(list_transform(string_split(text, '|'),
         l -> trim(l)), l -> l <> '') AS a
  FROM lined
),
lines AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos, a[i] AS line
  FROM (SELECT doc_id, a, unnest(range(1, len(a) + 1)) AS i FROM arrs)
),
keep AS (
  SELECT doc_id, pos, line,
         row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
  FROM lines
)
SELECT doc_id, string_agg(line, '|' ORDER BY pos) AS text,
       count(*) AS n_kept
FROM keep WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id
"""
diff("line_dedup", ld_spark, ld_sql)

# ---- dsir_sample ----
docs = nio.load_table(spark, SF, "documents")
ds_spark = curate.dsir_select(
    docs, docs.filter(F.col("lang") == "en"), 0.25,
    n_buckets=64, hash_fn="md5").orderBy("doc_id")
ds_sql = """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> ''))
      AS tok FROM documents
),
bt AS (
  SELECT doc_id,
         ('0x' || substr(md5(tok), 1, 15))::BIGINT % 64 AS bucket
  FROM tok
),
raw_d AS (SELECT bucket, count(*) AS c_raw FROM bt GROUP BY bucket),
tgt AS (
  SELECT ('0x' || substr(md5(u.tok), 1, 15))::BIGINT % 64 AS bucket
  FROM (SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
        FROM documents WHERE lang = 'en') u
),
tgt_d AS (SELECT bucket, count(*) AS c_tgt FROM tgt GROUP BY bucket),
grid AS (SELECT unnest(generate_series(0, 63)) AS bucket),
counts AS (
  SELECT g.bucket, coalesce(c_raw, 0) AS c_raw, coalesce(c_tgt, 0) AS c_tgt
  FROM grid g LEFT JOIN raw_d USING (bucket) LEFT JOIN tgt_d USING (bucket)
),
lr AS (
  SELECT bucket,
         ln((c_tgt + 1) * 1.0 / ((SELECT sum(c_tgt) FROM counts) + 64))
         - ln((c_raw + 1) * 1.0 / ((SELECT sum(c_raw) FROM counts) + 64))
           AS log_ratio
  FROM counts
),
pb AS (SELECT doc_id, bucket, count(*) AS c FROM bt GROUP BY 1, 2),
w AS (
  SELECT doc_id, round(sum(c * log_ratio), 6) AS log_w,
         CAST(sum(c) AS BIGINT) AS n_tokens
  FROM pb JOIN lr USING (bucket) GROUP BY doc_id
)
SELECT doc_id, log_w, n_tokens,
       row_number() OVER (ORDER BY log_w DESC, doc_id)
         <= ceil(0.25 * (SELECT count(*) FROM w)) AS selected
FROM w ORDER BY doc_id
"""
diff("dsir_sample", ds_spark, ds_sql)

# ---- winnow_fp ----
wf_spark = curate.winnow_profile(docs, k=5, w=4).orderBy("doc_id")
wf_sql = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> trim(t) <> '') AS l
  FROM documents
),
g AS (
  SELECT doc_id, len(l) AS n,
         list_transform(generate_series(1, len(l) - 4), i ->
             ('0x' || substr(md5(array_to_string(l[i:i+4], ' ')), 1, 7))::BIGINT
             * 2097152 + (2097152 - 1 - i)) AS keys
  FROM toks WHERE len(l) >= 5
),
wins AS (
  SELECT doc_id, n,
         CASE WHEN len(keys) >= 4 THEN
           list_distinct(list_transform(generate_series(1, len(keys) - 3),
               s -> list_min(keys[s:s+3])))
         ELSE [list_min(keys)] END AS w
  FROM g
),
fps AS (
  SELECT doc_id, n, unnest(w) AS k FROM wins
),
dec AS (
  SELECT doc_id, n, k // 2097152 AS fp FROM fps
),
prof AS (
  SELECT doc_id, any_value(n) - 4 AS n_grams, count(*) AS n_fps,
         count(DISTINCT fp) AS n_distinct, min(fp) AS min_fp
  FROM dec GROUP BY doc_id
)
SELECT doc_id, n_grams, n_fps, n_distinct,
       round(n_fps * 1.0 / greatest(n_grams, 1), 6) AS density, min_fp
FROM prof ORDER BY doc_id
"""
diff("winnow_fp", wf_spark, wf_sql)

# ---- tfidf_terms ----
tf_spark = curate.tfidf_top_terms(docs, top_k=3).orderBy("doc_id", "rank")
tf_sql = """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> ''))
      AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
s AS (
  SELECT doc_id, term, tf, df,
         round(tf * (ln((n + 1) * 1.0 / (df + 1)) + 1), 6) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
             ORDER BY tfidf DESC, term) AS rank
  FROM s
)
SELECT doc_id, rank, term, tf, tfidf FROM r WHERE rank <= 3
ORDER BY doc_id, rank
"""
diff("tfidf_terms", tf_spark, tf_sql)

# ---- winnow_overlap size probe ----
ov = curate.winnow_overlap(docs, k=5, w=4, min_shared=2)
print("winnow_overlap pairs:", ov.count())

spark.stop()
