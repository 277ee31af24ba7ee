"""Operator library (SURVEY.md §2 + training-data pipeline operators).

* ``windows`` — global sequence numbers (the reference's ``ordem``),
  fill-forward delta inheritance, per-group top-k.
* ``joins`` — seen-set anti-join, slug↔name broadcast lookup,
  dictionary-index decode join.
* ``dedup`` — exact, fingerprint, MinHash+LSH, SimHash, n-gram Jaccard,
  embedding-cosine near-duplicate detection.
* ``similarity`` — brute-force cosine top-k and LSH-bucketed ANN.
"""
