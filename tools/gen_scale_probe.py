#!/usr/bin/env python3
"""Generate the 10x replicated documents table for graft.ScaleProbe
(each doc appears 10 times under distinct ids -> 90% duplicate rate,
an extreme-dedup stress shape like raw CommonCrawl).

Usage: python3 tools/gen_scale_probe.py [outdir=/tmp/sf1x]
Then:  sbt "Test/runMain graft.ScaleProbe /tmp/sf1x"
"""
import sys
import duckdb

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1x"
import os
os.makedirs(out, exist_ok=True)
con = duckdb.connect()
con.sql(f"""
COPY (
  SELECT doc_id + 5000 * r AS doc_id, text, lang, source, n_chars
  FROM '/root/testdata/sf0.1/documents.parquet'
  CROSS JOIN (SELECT unnest(range(0, 10)) AS r)
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")
print(con.sql(f"SELECT count(*) FROM '{out}/documents.parquet'").fetchone()[0], "rows")
