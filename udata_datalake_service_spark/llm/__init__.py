"""Training-data pipeline operators (beyond the reference, SURVEY §7.2 ph.8).

Everything a 100 TB corpus pipeline needs on top of the relational layer:

- ``text``       — tokenization, language-ID, quality scoring, fingerprints.
- ``dedup``      — exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
                   near-dup.
- ``similarity`` — brute-force cosine top-k and LSH-bucketed ANN.
- ``multimodal`` — binary-column plumbing (decode/feature UDFs are stubs;
                   the Spark-side schema/batching is real).

Design rules: built-in column functions wherever possible (JVM-side,
codegen); hash families built on md5 so results are engine-portable and
oracle-checkable; Python only via Arrow-batched pandas UDFs.
"""
