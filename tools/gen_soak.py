#!/usr/bin/env python3
"""Generate the 10x soak tables (documents/embeddings/events) from an sf dir.

Usage: python3 tools/gen_soak.py /root/testdata/sf0.1 /tmp/soak10 [reps]

Each replica r offsets the ids; document text is ROTATED by r words so
replicas are near-dups of the original (changed shingle sets, same length
and vocab stats) rather than exact copies — exact copies would collapse
into single LSH buckets and overstate pair growth.

Every word also carries a DIALECT suffix derived from the base doc id
(doc_id % 101) plus a subfamily letter that splits the replicas into two
groups of reps/2. This fixes the round-3 degenerate soak: with the raw
~31-word vocabulary every 3-gram shingle's document frequency blew past
the stop-shingle caps, so the shingle-df operator family (x4, bucket-df
distributions) measured ~nothing. With dialects the vocabulary is
~31 × 101 × 2 ≈ 6k words, documents in different dialects share ZERO
shingles, and a near-dup family is reps/2 docs — inside x4's df ≤ 8 cap,
so the exact-Jaccard path has real work at 10×. Run with the SAME script
at reps=1 for the comparable 1× baseline (the transformation must match,
only the replica count differs).

Events keep the nanos-as-int64 ts format the real tables use
(Tables.events divides by 1000 either way).
"""
import sys
import duckdb

src, dst = sys.argv[1], sys.argv[2]
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
half = max(1, reps // 2)

con = duckdb.connect()
con.sql(f"CREATE TABLE r AS SELECT unnest(generate_series(0, {reps - 1})) AS r")

con.sql(f"""
COPY (
  -- n_chars is recomputed from the TRANSFORMED text (the dialect suffix
  -- lengthens every word): n_chars-keyed operators (z16 deciles) must sort
  -- on a key that tracks the synthetic corpus, not the source one
  SELECT doc_id, text, lang, source, length(text) AS n_chars
  FROM (
    SELECT d.doc_id + r.r * 1000000 AS doc_id,
           array_to_string(
             list_transform(
               CASE WHEN r.r = 0 THEN w
                    ELSE list_concat(w[r.r + 1:], w[1:r.r]) END,
               x -> x || '~' || (d.doc_id % 101)
                      || CASE WHEN r.r < {half} THEN 'a' ELSE 'b' END),
             ' ') AS text,
           d.lang, d.source
    FROM (SELECT *, string_split(text, ' ') AS w
          FROM '{src}/documents.parquet') d, r)
) TO '{dst}/documents.parquet' (FORMAT parquet)
""")

con.sql(f"""
COPY (
  SELECT e.vec_id + r.r * 1000000 AS vec_id, e.embedding, e.label
  FROM '{src}/embeddings.parquet' e, r
) TO '{dst}/embeddings.parquet' (FORMAT parquet)
""")

con.sql(f"""
COPY (
  SELECT e.event_id + r.r * 10000000 AS event_id,
         epoch_ns(e.ts) AS ts,
         e.user_id + r.r * 1000000 AS user_id,
         e.event_type, e.value, e.props
  FROM '{src}/events.parquet' e, r
) TO '{dst}/events.parquet' (FORMAT parquet)
""")

for t in ("documents", "embeddings", "events"):
    n = con.sql(f"SELECT COUNT(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
    print(t, n)
