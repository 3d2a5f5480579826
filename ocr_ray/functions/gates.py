"""Vectorized pre-classify gates — the filter-then-extract control flow.

This is the Ray-Data restatement of the reference's cheap page-level
predicates that gate the expensive per-page work (SURVEY.md §2 E2/F1-F5):

* gibberish/empty detector      policy_extract.py:123-153
* dollar-amount page predicate  policy_filter.py:111-138 (≥ $200, skip list)
* keyword page predicate        policy_filter.py:26-41,140-152
* language gate + markup gate   new (FIXTURES.md §1), analogous role to the
  corruption vote at policy_extract.py:384-443

Everything here is a pure function of Arrow arrays using pyarrow.compute
kernels — no Python row loops, no floats (ratio thresholds use integer
cross-multiplication), so gate decisions are bit-deterministic and cheap
enough to run over every row of a 10^12-row corpus before the heavy parse.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ocr_ray.config import DEFAULT_CONFIG, PipelineConfig

# Control characters excluding \t \n \r (policy_extract.py:137 counts
# ord(c) < 32 minus '\n\r\t').
_NONPRINTABLE_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F]"
# "weird" chars: not alnum (unicode), not ASCII (the reference's common-punct
# set is ASCII so only non-ASCII non-alnum chars count) —
# policy_extract.py:149-151.
_WEIRD_RE = r"[^\x00-\x7F\p{L}\p{N}]"
_ASCII_LETTER_RE = r"[A-Za-z]"
_NON_WS_RE = r"[^\s]"

# "$ amount >= 200" as a single RE2 pattern equivalent to: match
# r"\$\s*([0-9,]+)", strip commas, int(value) >= 200  (policy_filter.py:125-135).
# Derivation: after optional leading zeros/commas, either >=4 significant
# digits, or exactly-3-or-more starting 2-9.
DOLLAR_GE_200_RE = r"\$\s*[0,]*([1-9](,?[0-9]){3,}|[2-9](,?[0-9]){2})"


def dollar_amount_regex(min_amount: int) -> str:
    """RE2 pattern matching ``$ <number> >= min_amount`` (comma-tolerant).

    Only powers-of-ten-ish thresholds of the form d·10^k with a single
    leading significant digit bound are supported exactly; the engine uses
    the reference's fixed 200 (policy_filter.py:114) so we special-case it
    and otherwise fall back to ">= 10^digits" semantics.
    """
    if min_amount == 200:
        return DOLLAR_GE_200_RE
    digits = len(str(min_amount))
    lead = str(min_amount)[0]
    return (
        r"\$\s*[0,]*([1-9](,?[0-9]){%d,}|[%s-9](,?[0-9]){%d})"
        % (digits, lead, digits - 1)
    )


def _count(arr: pa.ChunkedArray | pa.Array, pattern: str) -> pa.ChunkedArray:
    return pc.count_substring_regex(arr, pattern)


def gibberish_mask(
    text: pa.ChunkedArray | pa.Array, cfg: PipelineConfig = DEFAULT_CONFIG
) -> dict[str, pa.ChunkedArray]:
    """Per-reason boolean masks of the gibberish/empty gate.

    Returns a dict of named reject masks (True == reject for that reason),
    mirroring the threshold order of policy_extract.py:123-153.
    """
    text = pc.coalesce(text, pa.scalar("", pa.string()))
    stripped_len = pc.utf8_length(pc.utf8_trim_whitespace(text))
    too_short = pc.less(stripped_len, cfg.gate_min_text_length)

    sample = pc.utf8_slice_codeunits(text, 0, cfg.gate_sample_chars)
    n = pc.utf8_length(sample)
    n_safe = pc.max_element_wise(n, 1)  # avoid 0-division; empty → too_short

    # count the RARE complement class and subtract: count_substring_regex
    # pays per match, so counting ~400 letters/sample costs 5-10x counting
    # the ~80 non-letters (same result, n - complement)
    non_ws = pc.subtract(n, _count(sample, r"\s"))
    # non_ws / n < 10%  ⇔  non_ws * 100 < n * 10
    mostly_ws = pc.less(pc.multiply(non_ws, 100), pc.multiply(n_safe, cfg.gate_min_non_ws_pct))

    nonprint = _count(sample, _NONPRINTABLE_RE)
    too_nonprintable = pc.greater(
        pc.multiply(nonprint, 100), pc.multiply(n_safe, cfg.gate_max_nonprintable_pct)
    )

    letters = pc.subtract(n, _count(sample, r"[^A-Za-z]"))
    low_letters = pc.less(
        pc.multiply(letters, 100), pc.multiply(n_safe, cfg.gate_min_ascii_letter_pct)
    )

    weird = _count(sample, _WEIRD_RE)
    too_weird = pc.greater(
        pc.multiply(weird, 100), pc.multiply(n_safe, cfg.gate_max_weird_pct)
    )

    return {
        "too_short": too_short,
        "mostly_whitespace": mostly_ws,
        "nonprintable": too_nonprintable,
        "low_ascii_letters": low_letters,
        "weird_chars": too_weird,
    }


def dollar_page_mask(
    text: pa.ChunkedArray | pa.Array, cfg: PipelineConfig = DEFAULT_CONFIG
) -> pa.ChunkedArray:
    """True where the text has a dollar amount >= cfg.dollar_min_amount and
    no skip pattern (policy_filter.py:111-138)."""
    text = pc.coalesce(text, pa.scalar("", pa.string()))
    has_amount = pc.greater(_count(text, dollar_amount_regex(cfg.dollar_min_amount)), 0)
    upper = pc.utf8_upper(text)
    skip = pa.array([False] * len(text)) if len(text) else pa.array([], pa.bool_())
    skip = pc.cast(skip, pa.bool_())
    for pat in cfg.dollar_skip_patterns:
        skip = pc.or_(skip, pc.match_substring(upper, pat))
    return pc.and_(has_amount, pc.invert(skip))


def keyword_page_mask(
    text: pa.ChunkedArray | pa.Array, cfg: PipelineConfig = DEFAULT_CONFIG
) -> pa.ChunkedArray:
    """True where lowercased text contains any configured keyword
    (policy_filter.py:140-152)."""
    text = pc.coalesce(text, pa.scalar("", pa.string()))
    lower = pc.utf8_lower(text)
    mask = pc.cast(pa.array([False] * len(text)) if len(text) else pa.array([], pa.bool_()), pa.bool_())
    for kw in cfg.keywords:
        mask = pc.or_(mask, pc.match_substring(lower, kw))
    return mask


def pre_classify(batch: pa.Table, cfg: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Add ``is_candidate: bool`` and ``reject_reason: string`` columns.

    Reject-reason precedence (fixed order so the decision is deterministic):
    lang → too_short → mostly_whitespace → nonprintable → low_ascii_letters
    → weird_chars → markup_heavy → '' (candidate).
    """
    text = batch["text"]
    lang_ok = pc.is_in(batch["lang"], value_set=pa.array(cfg.lang_allowlist))
    g = gibberish_mask(text, cfg)

    text_len = pc.utf8_length(pc.coalesce(text, pa.scalar("", pa.string())))
    if "html" in batch.column_names:
        html_col = batch["html"]
        html_len = pc.binary_length(html_col)
        # PDF-like char-box payloads are JSON-heavy by design — exempt them
        # from the markup-ratio gate (they go to the layout parser instead).
        is_pdf = pc.equal(
            pc.binary_slice(html_col, 0, 8), pa.scalar(b'{"pages"', pa.binary())
        )
        markup_heavy = pc.and_(
            pc.and_(
                pc.greater(html_len, 0),
                pc.less(pc.multiply(text_len, cfg.markup_ratio_mult), html_len),
            ),
            pc.invert(pc.coalesce(is_pdf, pa.scalar(False))),
        )
    else:
        markup_heavy = pc.cast(pa.nulls(len(batch)), pa.bool_())
        markup_heavy = pc.coalesce(markup_heavy, pa.scalar(False))

    # precedence chain via nested if_else (first hit wins)
    reason = pa.nulls(len(batch), pa.string())
    chain = [
        ("markup_heavy", markup_heavy),
        ("weird_chars", g["weird_chars"]),
        ("low_ascii_letters", g["low_ascii_letters"]),
        ("nonprintable", g["nonprintable"]),
        ("mostly_whitespace", g["mostly_whitespace"]),
        ("too_short", g["too_short"]),
        ("lang", pc.invert(pc.coalesce(lang_ok, pa.scalar(False)))),
    ]
    for name, mask in chain:  # applied innermost-last ⇒ 'lang' highest precedence
        reason = pc.if_else(pc.coalesce(mask, pa.scalar(False)), pa.scalar(name), reason)
    is_candidate = pc.is_null(reason)
    reason = pc.coalesce(reason, pa.scalar(""))

    batch = batch.append_column("is_candidate", pc.cast(is_candidate, pa.bool_()))
    batch = batch.append_column("reject_reason", pc.cast(reason, pa.string()))
    return batch
