"""Shared constants for the text/dedup/similarity ops.

Held in one place so the Spark implementations and the DuckDB oracle
SQL in ``__spark_entry__.py`` are generated from the SAME parameters —
cross-engine parity by construction (both engines share md5()).
"""

# tokenization: whitespace split of trimmed text
TOKEN_SPLIT_RE = r"\s+"

# word-shingle size for MinHash / Jaccard
SHINGLE_N = 3

# number of MinHash permutations; "hash k" of shingle s is the hex
# string md5(k || ':' || s) — identical in Spark and DuckDB — and the
# signature component is the lexicographic MIN of those strings.
MINHASH_K = 8

# LSH: band width 2 → 4 bands over the 8-component signature
LSH_BAND_WIDTH = 2

# SimHash: 32-bit fingerprint from per-token md5 hex digits
SIMHASH_BITS = 32

# language-ID stopword table: language → marker words (disjoint sets);
# score = token hits, argmax wins, ties → lexicographically smaller
# lang, zero hits → 'und'
LANG_MARKERS = {
    "en": ["the", "and", "is", "was", "of"],
    "de": ["der", "und", "ist", "nicht", "das"],
    "es": ["el", "los", "como", "pero", "por"],
    "fr": ["le", "les", "est", "dans", "avec"],
}

# quality score: weighted ratios, all computable in both engines
STOPWORDS = ["the", "a", "and", "of", "to", "is", "in", "it"]

# redaction (functions/text.py redact): applied in THIS order — urls
# first (they contain digits and @-free emails), then emails, then
# bare long digit runs.  Patterns restricted to constructs Spark's
# Java regex and DuckDB's RE2 evaluate identically (no lookaround).
REDACT_URL_RE = r"https?://[^\s]+"
REDACT_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
REDACT_NUM_RE = r"[0-9][0-9][0-9][0-9][0-9][0-9]+"  # 6+ digit runs
REDACT_TOKENS = {"url": "<URL>", "email": "<EMAIL>", "num": "<NUM>"}

# duplicate-span detection (exact-substring dedup signal, the shape of
# Lee et al. 2022 "Deduplicating Training Data Makes Language Models
# Better": substrings repeated verbatim across the corpus): span =
# DUP_SPAN_K consecutive tokens at each position; a span hash occurring
# in >= DUP_SPAN_MIN_DOCS distinct documents is corpus-duplicated.
DUP_SPAN_K = 5
DUP_SPAN_MIN_DOCS = 2

# hashed-n-gram linear quality classifier (fastText architecture:
# hashing-trick buckets + linear layer + sigmoid).  Weights are derived
# from md5 so Spark and the DuckDB oracle share them bit-for-bit; a
# learned weight vector drops in as a broadcast array with the same
# plan shape.
QCLS_BUCKETS = 512
QCLS_SEED = 7
QCLS_THRESHOLD = 0.5

# host-reputation gate: a document is kept when its host's mean
# quality_score clears the floor
HOST_MIN_QUALITY = 0.55

# context-window chunking (RAG / eval-slice preparation): fixed token
# windows with overlap; stride = CHUNK_TOKENS - CHUNK_OVERLAP
CHUNK_TOKENS = 16
CHUNK_OVERLAP = 4

# training-corpus selection gates (functions/corpus.py): Gopher-style
# repetition caps + quality floor + language gate; dedup keeps min doc_id
CORPUS_LANG = "en"
CORPUS_MIN_QUALITY = 0.5
CORPUS_MAX_TOP_BIGRAM = 0.2
CORPUS_MAX_DUP_TRIGRAM = 0.2
