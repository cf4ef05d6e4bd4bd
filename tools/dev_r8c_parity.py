"""Dev parity for round-8 batch 3: gopher_quality, readability."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from neo_server_spark.session import get_spark
from neo_server_spark import io as nio
from neo_server_spark.datapipe import curate

SF = os.environ.get("SF_DIR", "/root/testdata/sf0.001")
spark = get_spark(app_name="r8c-dev", master="local[8]", shuffle_partitions=8)
con = duckdb.connect()
con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")


def diff(name, sdf, sql):
    s = sdf.toPandas().reset_index(drop=True)
    d = con.sql(sql).df().reset_index(drop=True)
    s, d = s[sorted(s.columns)], d[sorted(d.columns)]
    try:
        pd.testing.assert_frame_equal(s, d, check_dtype=False)
        print(f"{name}: OK rows={len(s)}")
    except AssertionError as e:
        print(f"{name}: MISMATCH")
        print(str(e)[:600])
        print("spark:\n", s.head(3).T)
        print("duck:\n", d.head(3).T)


docs = nio.load_table(spark, SF, "documents")

gq = curate.gopher_quality(docs).orderBy("doc_id")
GQ_SQL = """
WITH base AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), t -> t <> '') AS w,
         list_filter(list_transform(string_split(text, chr(10)),
                     l -> trim(l)), l -> l <> '') AS l
  FROM documents
),
m AS (
  SELECT doc_id,
         len(w) AS n_words,
         round(list_sum(list_transform(w, x -> len(x))) * 1.0
               / greatest(len(w), 1), 6) AS mean_word_len,
         round(list_sum(list_transform(w, x -> len(x)
               - len(replace(replace(x, '#', ''), '...', '')))) * 1.0
               / greatest(len(w), 1), 6) AS symbol_ratio,
         round(len(list_filter(l, x -> x LIKE '-%' OR x LIKE '*%'
               OR x LIKE '•%')) * 1.0 / greatest(len(l), 1), 6)
           AS bullet_frac,
         round(len(list_filter(l, x -> x LIKE '%...')) * 1.0
               / greatest(len(l), 1), 6) AS ellipsis_frac,
         round(len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]')))
               * 1.0 / greatest(len(w), 1), 6) AS alpha_word_frac,
         len(list_intersect(list_transform(w, x -> lower(x)),
             ['the','be','to','of','and','that','have','with']))
           AS n_stop_words
  FROM base
)
SELECT *,
       n_words >= 50 AND n_words <= 100000 AS ok_words,
       mean_word_len >= 3 AND mean_word_len <= 10 AS ok_mean_len,
       symbol_ratio <= 0.1 AS ok_symbols,
       bullet_frac < 0.9 AS ok_bullets,
       ellipsis_frac < 0.3 AS ok_ellipsis,
       alpha_word_frac >= 0.8 AS ok_alpha,
       n_stop_words >= 2 AS ok_stops,
       (n_words >= 50 AND n_words <= 100000)
       AND (mean_word_len >= 3 AND mean_word_len <= 10)
       AND symbol_ratio <= 0.1 AND bullet_frac < 0.9
       AND ellipsis_frac < 0.3 AND alpha_word_frac >= 0.8
       AND n_stop_words >= 2 AS keep
FROM m ORDER BY doc_id
"""
diff("gopher_quality", gq, GQ_SQL)

rd = curate.readability(docs).orderBy("doc_id")
RD_SQL = """
WITH base AS (
  SELECT doc_id, text,
         list_filter(string_split(text, ' '), t -> t <> '') AS w
  FROM documents
),
m AS (
  SELECT doc_id,
         greatest(len(w), 1) AS n_words,
         greatest(len(list_filter(regexp_split_to_array(text, '[.!?]+'),
                  s -> trim(s) <> '')), 1) AS n_sentences,
         list_sum(list_transform(w, x -> greatest(1,
             len(list_filter(string_split(regexp_replace(lower(x),
                 '[^aeiouy]+', ' ', 'g'), ' '), s -> s <> '')))))
           AS n_syllables
  FROM base
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       round(206.835 - 1.015 * (n_words * 1.0 / n_sentences)
             - 84.6 * (n_syllables * 1.0 / n_words), 6) AS flesch
FROM m ORDER BY doc_id
"""
diff("readability", rd, RD_SQL)
spark.stop()
