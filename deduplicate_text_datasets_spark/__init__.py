"""deduplicate_text_datasets_spark — a from-scratch PySpark-native engine with the
query and data-processing capabilities of google-research/deduplicate-text-datasets.

The reference (/root/reference, Rust + Python) is a single-machine suffix-array
dataflow engine for the ExactSubstr half of Lee et al. 2021
(arXiv:2107.06499); its NearDup half exists only as released cluster CSVs.
This package provides both halves natively on Spark DataFrames:

- ``operators.minhash``  — MinHash signatures + LSH banding (NearDup)
- ``operators.simhash``  — SimHash fingerprints + Hamming-ball blocking
- ``operators.suffix``   — ExactSubstr: window-fingerprint self-similar /
  across-similar, per-shard suffix-array kernels for count-occurrences and
  find-training-data (reference: src/main.rs cmd_self_similar,
  cmd_across_similar, cmd_count_occurrences, cmd_find_training_data_2)
- ``operators.intervals`` — collect/interval coalescing (main.rs:1408-1526)
  and scalable interval joins
- ``operators.strike``   — removal application (scripts/finish_dedup_wiki40b.py)
- ``operators.connected_components`` — small-star/large-star clustering
- ``operators.exact`` / ``operators.ngram`` / ``operators.ann`` /
  ``operators.textstats`` / ``operators.multimodal`` — training-data-pipeline
  extensions (exact dedup, n-gram Jaccard, embedding ANN, text analysis,
  multimodal plumbing)

Everything is DataFrame-first: Catalyst plans the relational stages, and the
only Python on the hot path is vectorized Arrow/pandas kernels.
"""

__version__ = "0.1.0"
