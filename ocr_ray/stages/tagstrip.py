"""Engine 2 — vectorized regex tag-strip extractor.

The cheap cross-check engine of the dual-extraction pair, the analogue of
the reference's plain text-layer engines and last-resort fallbacks
(cert_extract_gl.py:83-134, mypdf2.py:377-486 — SURVEY.md §2 B5/B6).

Fully vectorized over Arrow string columns with pyarrow.compute RE2 kernels
— no Python per-row work — so it can run over every candidate row at 100 TB
scale as a stateless map_batches stage.  RE2 has no backreferences, so the
container-tag strip is one pass per tag name instead of ``</\\1>``.

Spec (deterministic; the scalar oracle is this same code on a 1-row array):
  1. remove <script>/<style>/<noscript>/<template> elements incl. content
  2. remove <!-- comments -->
  3. replace every remaining tag with a single space
  4. single-pass unescape of the common entities
  5. collapse whitespace runs to one space; trim
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_CONTAINER_TAGS = ("script", "style", "noscript", "template")
# single-pass entity unescape: ordered so '&amp;lt;' → '&lt;' (not '<'),
# matching html.unescape's non-recursive behavior for these entities
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def tagstrip_array(html_str: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """Strip markup from a string column; returns the extracted text column."""
    s = pc.coalesce(pc.cast(html_str, pa.string()), pa.scalar(""))
    for tag in _CONTAINER_TAGS:
        s = pc.replace_substring_regex(
            s, r"(?is)<%s\b[^>]*>.*?</%s\s*>" % (tag, tag), " "
        )
    s = pc.replace_substring_regex(s, r"(?s)<!--.*?-->", " ")
    s = pc.replace_substring_regex(s, r"<[^>]*>", " ")
    for ent, rep in _ENTITIES:
        s = pc.replace_substring(s, ent, rep)
    s = pc.replace_substring_regex(s, r"\s+", " ")
    return pc.utf8_trim_whitespace(s)


def tagstrip(html_str: str) -> str:
    """Scalar spec == the vectorized kernel applied to one row."""
    return tagstrip_array(pa.array([html_str]))[0].as_py()
