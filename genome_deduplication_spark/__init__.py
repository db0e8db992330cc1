"""genome_deduplication_spark — a PySpark-native near-duplicate detection
and clustering engine for web-scale text corpora.

Re-expresses the semantics of the reference genome k-mer deduplication
pipeline (astrovsky01/genome-deduplication, surveyed in SURVEY.md) as an
idiomatic Spark DataFrame pipeline:

  pages(url, warc_ts, html, text, lang)
    -> normalize text          (reference: code/dedup2.py:467-468)
    -> shingle hashes          (reference k-mer loop: code/dedup2.py:135-139)
    -> MinHash signatures      (reference seen_kmers set: code/dedup2.py:142)
    -> LSH band buckets        (set membership at scale)
    -> candidate pairs -> SimHash/Jaccard verification
    -> suffix-array exact-substring pass (reference masks: code/dedup2.py:18)
    -> connected components    (reference cross-file state: code/dedup2.py:549-554)
    -> cluster table with canonical doc = min(warc_ts, url)
       (reference first-occurrence-wins: code/dedup2.py:420-421)

No code is copied from the reference; it is cited for semantics only.
"""

__version__ = "0.1.0"
