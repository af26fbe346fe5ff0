"""Dump the UNSETTLED dd_lsh_eval composition plan (settle() collapses
the declared plan to Scan ExistingRDD, so the committed dump must be
taken on the pre-settle frame). Usage: python dump_lsh_eval_plan.py <repo> <out>"""
import sys
repo, out = sys.argv[1], sys.argv[2]
sys.path.insert(0, repo)
from pyspark.sql import functions as F
from udata_datalake_service_spark.session import get_spark
from udata_datalake_service_spark.llm.dedup import (
    lsh_candidate_pairs, minhash_jaccard_estimate, minhash_signatures,
    ngram_jaccard_pairs, pair_set_eval, shingles_of_tokens)
from udata_datalake_service_spark.llm.text import tokens
import inspect

spark = get_spark(master="local[32]")
d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select("doc_id", "text")
N, K, BANDS, ROWS = 8, 2, 2, 4
sig = inspect.signature(minhash_signatures)
if "shingles" in sig.parameters:
    shs = (d.select(F.col("doc_id").alias("id"), tokens(F.col("text")).alias("__t"))
             .select("id", F.explode(F.array_distinct(shingles_of_tokens(F.col("__t"), K))).alias("sh"))
             .persist())
    sigs = minhash_signatures(d, num_hashes=N, k=K, shingles=shs).persist()
    idx = shs.select("id", F.xxhash64("sh").alias("sh"))
    exact = ngram_jaccard_pairs(d, k=K, threshold=0.35, index=idx)
else:
    sigs = minhash_signatures(d, num_hashes=N, k=K).persist()
    exact = ngram_jaccard_pairs(d, k=K, threshold=0.35)
cand = lsh_candidate_pairs(sigs, num_bands=BANDS, rows_per_band=ROWS)
approx = minhash_jaccard_estimate(sigs, cand).filter(F.col("jaccard_est") >= 0.35)
frame = pair_set_eval(approx, exact)
txt = frame._sc._jvm.PythonSQLUtils.explainString(frame._jdf.queryExecution(), "formatted")
open(out, "w").write(txt)
print(out, "split_nodes:", txt.count("split("), "InMemoryRelation:", txt.count("InMemoryRelation"), "Exchange:", txt.count("Exchange"))
