"""ocr_ray — a Ray-Data-native main-content extraction engine.

Brand-new engine with the query/data-processing capabilities of the
reference repo (mudassirkhan-17/Ocr, see /root/repo/SURVEY.md), re-expressed
Ray-Data-first over Common-Crawl-style web-page tables:

    pages(url: string, warc_ts: timestamp[us], html: binary,
          text: string, lang: string)

Design stance (SURVEY.md §7):
  * One logical table == one ``ray.data.Dataset``; blocks are Arrow.
  * Vectorized pre-classify gates (``functions.gates``) run as stateless
    ``map_batches`` over zero-copy Arrow so only candidate pages hit the
    heavy DOM / layout parse.
  * Heavy parsers are stateful actor pools (``stages.html_extract``,
    ``stages.pdf_layout``) — compiled state in ``__init__``, per-batch work
    in ``__call__``.
  * The only wide op on the hot path is the url-hash repartition /
    partition-granular checkpointed write (``state.manifest``).
  * Determinism: extracted text is byte-identical per url regardless of
    partitioning or parallelism; no wall-clock values in row content.

Nothing in this package calls ``ray.init`` / ``ray.shutdown`` — sessions are
owned by bench.py / CLI / test fixtures (driver contract).
"""

from ocr_ray.config import PipelineConfig

__all__ = ["PipelineConfig"]
__version__ = "0.1.0"
