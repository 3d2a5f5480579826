"""Text-analysis operators for large-scale training-data pipelines:
language-ID heuristic, quality scoring, token counting, fingerprinting.

All vectorized over Arrow string columns (pyarrow.compute RE2 kernels);
fingerprinting uses hashlib.md5 per row (a C call — the only per-row work,
and deliberately the same algorithm as DuckDB's ``md5()`` so the driver's
SQL oracle can verify it exactly).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

# marker stop-words per language for the n-gram-free language-ID heuristic;
# word-boundary regexes (RE2 \b — same semantics in DuckDB) so substrings
# don't count.  Tie-break order = tuple order (en, de, fr, es).
LANG_MARKERS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("en", ("the", "and", "of", "to", "is")),
    ("de", ("der", "die", "und", "ist", "nicht")),
    ("fr", ("le", "la", "et", "les", "est")),
    ("es", ("el", "los", "que", "es", "una")),
)

STOPWORDS_EN = ("the", "and", "of", "a", "to")

WS_TOKEN_RE = r"\S+"
# BPE-ish pre-tokenizer: letter runs | digit runs | single punctuation
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _marker_count(text, words: tuple[str, ...]):
    total = None
    for w in words:
        c = pc.count_substring_regex(text, r"\b%s\b" % w)
        total = c if total is None else pc.add(total, c)
    return total


def token_count_columns(text: pa.ChunkedArray | pa.Array) -> dict:
    """n_ws_tokens (whitespace) and n_bpe_tokens (BPE-ish regex) columns."""
    text = pc.coalesce(text, pa.scalar(""))
    return {
        "n_ws_tokens": pc.cast(pc.count_substring_regex(text, WS_TOKEN_RE), pa.int64()),
        "n_bpe_tokens": pc.cast(pc.count_substring_regex(text, BPE_TOKEN_RE), pa.int64()),
    }


def quality_columns(text: pa.ChunkedArray | pa.Array) -> dict:
    """Deterministic quality-scoring columns: length, token count, stopword
    hits, punctuation count, and an integer quality flag.

    quality_ok = len >= 50 AND n_tokens >= 10 AND stopword_hits >= 1
    (cheap analogue of the reference's content_length>100 + expected-keyword
    validation, qc_head.py:490-540).
    """
    text = pc.coalesce(text, pa.scalar(""))
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_tokens = pc.cast(pc.count_substring_regex(text, WS_TOKEN_RE), pa.int64())
    stop_hits = pc.cast(_marker_count(text, STOPWORDS_EN), pa.int64())
    n_punct = pc.cast(
        pc.count_substring_regex(text, r"[.,;:!?]"), pa.int64()
    )
    ok = pc.and_(
        pc.and_(pc.greater_equal(n_chars, 50), pc.greater_equal(n_tokens, 10)),
        pc.greater_equal(stop_hits, 1),
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "stopword_hits": stop_hits,
        "n_punct": n_punct,
        "quality_ok": pc.cast(ok, pa.bool_()),
    }


def langid_column(text: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """Predicted language by marker-word argmax; ties resolve in LANG_MARKERS
    order; all-zero → 'und'.  Exactly expressible as a SQL CASE cascade."""
    text = pc.coalesce(text, pa.scalar(""))
    counts = [(lang, _marker_count(text, words)) for lang, words in LANG_MARKERS]
    pred = pa.scalar("und")
    # build the cascade back-to-front so earlier languages win ties
    result = pc.if_else(pc.greater(counts[-1][1], 0), pa.scalar(counts[-1][0]), pred)
    for i in range(len(counts) - 2, -1, -1):
        lang, c = counts[i]
        cond = pc.greater(c, 0)
        for _, c2 in counts[i + 1:]:
            cond = pc.and_(cond, pc.greater_equal(c, c2))
        result = pc.if_else(cond, pa.scalar(lang), result)
    return result


def repetition_columns(text: pa.ChunkedArray | pa.Array) -> dict:
    """Gopher-style repetition signals per document (Rae et al. 2021 §A1.1
    repetition filters, public method): line- and word-level duplicate
    counts plus a dominant-token flag.

    Columns (all int64 — integer-only so the SQL oracle hashes exactly):
      n_lines / n_distinct_lines      split on '\\n' (empties kept: an
                                      empty segment is a line);
      n_words / n_distinct_words      lower().split() whitespace tokens;
      top_word_n                      occurrences of the most frequent word;
      repetitive                      1 iff top_word_n*5 >= n_words > 0
                                      (dominant token >= 20% of the doc).

    Per-row Counter work is the tokenize cost itself (no vectorized
    kernel computes per-doc distinct counts); everything else stays in
    Arrow.  Embarrassingly parallel — no shuffle at any scale.
    """
    import collections

    vals = text.to_pylist()
    n_l, n_dl, n_w, n_dw, top_n = [], [], [], [], []
    for v in vals:
        s = v or ""
        lines = s.split("\n")
        n_l.append(len(lines))
        n_dl.append(len(set(lines)))
        words = s.lower().split()
        n_w.append(len(words))
        if words:
            c = collections.Counter(words)
            n_dw.append(len(c))
            top_n.append(max(c.values()))
        else:
            n_dw.append(0)
            top_n.append(0)
    n_words = pa.array(n_w, pa.int64())
    top_word_n = pa.array(top_n, pa.int64())
    repetitive = pc.cast(
        pc.and_(pc.greater(n_words, 0),
                pc.greater_equal(pc.multiply(top_word_n, 5), n_words)),
        pa.int64())
    return {
        "n_lines": pa.array(n_l, pa.int64()),
        "n_distinct_lines": pa.array(n_dl, pa.int64()),
        "n_words": n_words,
        "n_distinct_words": pa.array(n_dw, pa.int64()),
        "top_word_n": top_word_n,
        "repetitive": repetitive,
    }


def md5_fingerprint(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Hex MD5 per row — DuckDB ``md5(text)``-compatible content hash used
    for exact dedup (J2 keep-first semantics at corpus scale)."""
    vals = text.to_pylist() if not isinstance(text, list) else text
    return pa.array(
        [hashlib.md5((v or "").encode("utf-8")).hexdigest() for v in vals],
        pa.string(),
    )


def rolling_hashes(text: str, k: int = 8, base: int = 257,
                   mod: int = (1 << 61) - 1) -> "np.ndarray":
    """Rabin-Karp rolling hashes of every k-char window.

    h(i) = sum(ord(c_j) * base^(k-1-j)) mod p over window i via the O(n)
    prefix-sum recurrence (python-int arithmetic for the 61-bit modulus;
    cost is linear in text length and only runs on texts selected for
    fingerprinting).
    """
    import numpy as np

    if len(text) < k:
        return np.zeros(0, dtype=np.uint64)
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    n = len(codes)
    pref = [0] * (n + 1)
    p = pref
    for i in range(n):
        p[i + 1] = (p[i] * base + int(codes[i])) % mod
    top = pow(base, k, mod)
    out = np.empty(n - k + 1, dtype=np.uint64)
    for i in range(n - k + 1):
        out[i] = (p[i + k] - p[i] * top) % mod
    return out


def winnow_fingerprint(text: str, k: int = 8, window: int = 4) -> list[int]:
    """Winnowing (MOSS-style) document fingerprint: the minimum rolling
    hash of each sliding window of k-gram hashes, deduplicated, sorted.

    Guarantees: any shared substring of length >= k + window - 1 between two
    documents yields at least one shared fingerprint — the rolling-hash
    fingerprinting operator for near-copy detection at corpus scale.
    """
    import numpy as np

    h = rolling_hashes(text.lower(), k)
    if h.size == 0:
        return []
    if h.size <= window:
        return [int(h.min())]
    # sliding-window minimum via stride tricks
    sw = np.lib.stride_tricks.sliding_window_view(h, window)
    mins = sw.min(axis=1)
    return sorted({int(x) for x in mins})
