"""Dev parity for round-8 batch 2: lm2, char_entropy, mad_outliers,
dedup_incr."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
import pyspark.sql.functions as F

from neo_server_spark.session import get_spark
from neo_server_spark import io as nio
from neo_server_spark.datapipe import curate, dedup

SF = os.environ.get("SF_DIR", "/root/testdata/sf0.001")

spark = get_spark(app_name="r8b-dev", master="local[8]", shuffle_partitions=8)
con = duckdb.connect()
con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")


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
        print(str(e)[:800])
        print("spark:\n", s.head(4))
        print("duck:\n", d.head(4))


docs = nio.load_table(spark, SF, "documents")

# ---- lm2 ----
lm2_spark = curate.lm_score_bigram(docs).orderBy("doc_id")
lm2_sql = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS l
  FROM documents
),
occ AS (
  SELECT doc_id, l[i] AS w1, l[i+1] AS w2
  FROM (SELECT doc_id, l, unnest(range(1, len(l))) AS i FROM toks)
),
uni AS (
  SELECT u.w AS w, count(*) AS cu
  FROM (SELECT unnest(l) AS w FROM toks) u GROUP BY 1
),
tot AS (SELECT sum(cu) AS t FROM uni),
big AS (SELECT w1, w2, count(*) AS cb FROM occ GROUP BY 1, 2)
SELECT doc_id,
       round(avg(ln(0.7 * cb / c1.cu + 0.3 * c2.cu / t)), 6) AS lm2_score,
       count(*) AS n_bigrams
FROM occ JOIN big USING (w1, w2)
     JOIN uni c1 ON c1.w = occ.w1
     JOIN uni c2 ON c2.w = occ.w2
     CROSS JOIN tot
GROUP BY doc_id ORDER BY doc_id
"""
diff("lm2", lm2_spark, lm2_sql)

# ---- char_entropy ----
ce_spark = curate.char_entropy(docs).orderBy("doc_id")
ce_sql = """
WITH base AS (
  SELECT doc_id, text, length(text) AS n,
         list_sort(list_distinct(string_split(text, ''))) AS dch
  FROM documents
)
SELECT doc_id, n AS n_chars, len(dch) AS n_distinct_chars,
       round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(dch, ch ->
               -(len(list_filter(string_split(text, ''), c -> c = ch))
                 / CAST(n AS DOUBLE))
               * ln(len(list_filter(string_split(text, ''), c -> c = ch))
                    / CAST(n AS DOUBLE)))),
           (acc, x) -> acc + x), 6) AS entropy
FROM base ORDER BY doc_id
"""
diff("char_entropy", ce_spark, ce_sql)

# ---- mad_outliers ----
mo_spark = curate.mad_outliers(docs).orderBy("doc_id").drop("doc_id") \
    .withColumn("rid", F.monotonically_increasing_id())
# keep doc_id for compare instead:
mo_spark = curate.mad_outliers(docs).orderBy("doc_id")
mo_sql = """
WITH med AS (
  SELECT source, quantile_cont(n_chars, 0.5) AS med
  FROM documents GROUP BY source
),
dev AS (
  SELECT d.doc_id, d.source, d.n_chars, m.med,
         abs(d.n_chars - m.med) AS adev
  FROM documents d JOIN med m USING (source)
),
mad AS (
  SELECT source, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY source
)
SELECT doc_id, dev.source, CAST(n_chars AS DOUBLE) AS value,
       round(dev.med, 6) AS med, round(mad.mad, 6) AS mad,
       round(0.6745 * adev / greatest(mad.mad, 1e-12), 6) AS mod_z,
       0.6745 * adev / greatest(mad.mad, 1e-12) > 3.0 AS outlier
FROM dev JOIN mad USING (source) ORDER BY doc_id
"""
diff("mad_outliers", mo_spark, mo_sql)

# ---- dedup_incr ----
seen = dedup.digest_index(docs.filter(F.col("doc_id") % 3 == 0))
newb = docs.filter(F.col("doc_id") % 3 != 0)
di_spark = dedup.dedup_incremental(newb, seen) \
    .select("doc_id", "source", "n_chars").orderBy("doc_id")
di_sql = """
WITH seen AS (
  SELECT DISTINCT md5(text) AS d FROM documents WHERE doc_id % 3 = 0
),
newb AS (
  SELECT doc_id, source, n_chars, md5(text) AS d
  FROM documents WHERE doc_id % 3 <> 0
),
fresh AS (
  SELECT * FROM newb WHERE d NOT IN (SELECT d FROM seen)
),
keep AS (SELECT d, min(doc_id) AS doc_id FROM fresh GROUP BY d)
SELECT f.doc_id, f.source, f.n_chars
FROM fresh f JOIN keep k ON f.d = k.d AND f.doc_id = k.doc_id
ORDER BY f.doc_id
"""
diff("dedup_incr", di_spark, di_sql)

spark.stop()
