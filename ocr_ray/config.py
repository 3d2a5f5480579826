"""Pipeline configuration.

Every tunable constant in the reference repo becomes a config field here
(SURVEY.md §2 N: the reference's extension surface is per-carrier script
copies differing only in constants — e.g. qc_head.py vs qc_head_0.py differ
only in merge buffer 3→0).  Citations are into /root/reference/.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# Keyword page-predicate set (policy_filter.py:26-41; the extended 20-term
# variant at policy_additional_interests.py:26-51 adds schedule-header terms).
ADDITIONAL_INTEREST_KEYWORDS: tuple[str, ...] = (
    "additional interest",
    "additional interests",
    "additional insured",
    "additional insureds",
    "mortgagee",
    "mortgage holder",
    "mortgage holders",
    "mortgagees",
    "loss payee",
    "loss payable",
    "lienholder",
    "lien holder",
    "secured party",
    "secured parties",
)

# Page-level skip patterns for the dollar predicate (policy_filter.py:116).
DOLLAR_SKIP_PATTERNS: tuple[str, ...] = (
    "EXAMPLE",
    "CALCULATION",
    "HOW TO",
    "SAMPLE",
    "ILLUSTRATION",
)


@dataclass(frozen=True)
class PipelineConfig:
    """All thresholds of the extraction engine, with reference lineage."""

    # ---- language gate (new: lang column allowlist; FIXTURES.md §1) ----
    lang_allowlist: tuple[str, ...] = ("en", "de", "fr", "es")

    # ---- gibberish / empty gate (policy_extract.py:123-153) ----
    gate_min_text_length: int = 10          # len(text.strip()) < 10 → reject
    gate_sample_chars: int = 500            # heuristics run on text[:500]
    # ratios are expressed as integer percents; comparisons use integer
    # cross-multiplication so the gate is float-free and deterministic
    gate_min_non_ws_pct: int = 10           # <10% non-whitespace → reject
    gate_max_nonprintable_pct: int = 30     # >30% control chars → reject
    gate_min_ascii_letter_pct: int = 20     # <20% [A-Za-z] → reject
    gate_max_weird_pct: int = 30            # >30% non-ASCII non-alnum → reject

    # ---- markup-heaviness gate (new; analogue of the corruption vote
    # policy_extract.py:384-443 — reject pages that are almost all markup)
    # reject when text_len * markup_ratio_mult < html_len (text <5% of html)
    markup_ratio_mult: int = 20

    # ---- dollar page predicate (policy_filter.py:111-138) ----
    dollar_min_amount: int = 200

    # ---- filter buffer+merge (policy_filter.py:154-178; buffer=1 default,
    # qc_head.py:268 uses 3, qc_head_0.py:268 uses 0) ----
    page_buffer: int = 1
    max_filtered_pages: int = 25            # policy_additional_interests.py:223

    # ---- HTML main-content extraction (our DOM walker; semantics analogous
    # to the density/fallback chain at policy_extract.py:330-388) ----
    min_block_chars: int = 25               # content block minimum length
    # keep block when link_chars * 100 <= block_chars * max_link_density_pct
    max_link_density_pct: int = 50
    block_join: str = "\n"                  # extracted_text = join of blocks

    # ---- engine vote (policy_extract.py:384-443: corrupted-ratio>0.5 or
    # chars<1000 switches engines; ours votes per row) ----
    vote_min_chars: int = 1                 # engine1 empty → fall back
    # engine1 also falls back when its output fails the gibberish gate

    # ---- PDF layout clustering (pdfminer-style; SURVEY.md §7 M3) ----
    pdf_line_tol: float = 2.0               # |y1-y2| <= tol → same line
    pdf_block_gap: float = 18.0             # y gap > gap → new block
    pdf_space_gap: float = 2.5              # x gap > gap → insert space
    pdf_column_gap: float = 40.0            # x gap between column clusters

    # ---- execution knobs ----
    # NOTE: gate and extract map_batches fuse into one actor-pool operator;
    # the FIRST stage's batch_size sets the task granularity, so both are
    # kept equal — small enough that tasks >> actors (no starvation), large
    # enough that the vectorized kernels amortize their launch cost.
    batch_size_gates: int = 256             # vectorized stage, cheap per row
    batch_size_extract: int = 256           # heavy per-doc stage, multi-KB html
    # actor pool min/max; None → size to the Ray cluster at pipeline build
    # time ((2, num_cpus - 2), leaving headroom for read + write stages)
    extract_concurrency: tuple[int, int] | None = None
    num_output_partitions: int = 16         # url-hash partitions (checkpoint unit)

    # ---- dedup / near-dup scale knobs (SURVEY §2 N: every constant is a
    # config field; defaults preserve the round-3 oracle hashes) ----
    pair_dedup_buckets: int = 64        # dedupe_pairs / winnow pair-sum shuffle width
    fuse_pairs_threshold: int = 20_000  # near-dup tail fuses to ONE task below this
    near_dup_coarse_buckets: int = 64   # minhash/simhash/winnow band-bucket width
    near_dup_max_bucket: int = 512      # star-pairing cap in degenerate buckets
    winnow_max_postings: int = 256      # drop fingerprints shared by more docs
    ngram_jaccard_threshold_pct: int = 80  # exact n-gram Jaccard pair cutoff (%)
    ngram_max_postings: int = 256       # drop shingles shared by more docs
    line_dedup_min_docs: int = 5        # a line in >= this many docs is boilerplate
    # ---- embedding near-dup / ANN layout knobs ----
    near_dup_blocks: int = 8            # embedding_near_dup block-partition count
    lsh_near_dup_tables: int = 32       # embedding_near_dup_lsh hash tables
    lsh_near_dup_bits: int = 4          # ...bits per table
    lsh_near_dup_max_bucket: int = 4096 # ...star-pairing cap
    lsh_index_bits: int = 8             # knn_lsh / build_lsh_index bucket bits
                                        # (2^bits partitions; at 100 TB raise so a
                                        # partition ≈ an object-store-friendly chunk)
    ivf_clusters: int = 16              # knn_ivf / build_ivf_index cells
    ivf_train_sample: int = 2048        # ...quantizer training prefix size
    # ---- connected-components knobs (pipelines/graph.py) ----
    cc_small_graph_edges: int = 4_000_000  # single-task union-find ceiling
    kcore_fuse_nodes: int = 2_000_000   # kcore_peel_counts: at or below this
                                        # node count the peel runs fused in
                                        # ONE task (ids are 8 bytes; above it
                                        # the 2-exchange message rounds win)
    cc_message_buckets: int = 64        # label-propagation delivery buckets
                                        # (POWER OF TWO — bucketing is key & (n-1))

    # ---- corpus-curation knobs (round-4 operators; defaults preserve
    # the round-4 oracle hashes) ----
    domain_cap_k: int = 10              # docs kept per source/domain
    kmv_sketch_k: int = 256             # KMV count-distinct minimum values
    range_join_window_us: int = 3600 * 1_000_000  # interval-join window (1 h)
    contamination_shingle_w: int = 3    # eval-overlap word n-gram width
    dsir_buckets: int = 256             # dsir_weights: hashed-feature buckets
                                        # (DSIR uses ~10^4 at corpus scale;
                                        # the bucket vector is O(buckets)
                                        # regardless of corpus size)
    dsir_target_lang: str = "en"        # ...the target-domain selector
    dup_span_window: int = 8            # dup_span_stats: tokens per window
    dup_span_min_count: int = 2         # ...a window occurring >= this many
                                        # times corpus-wide is duplicated
    bpe_fuse_vocab_rows: int = 200_000  # bpe_merges: vocab at or below this
                                        # runs all rounds in ONE task (per-
                                        # round shuffle fixed costs only
                                        # amortize above it)
    term_hot_frac: int = 64             # a term/context token owning >=
                                        # 1/frac of the corpus token stream
                                        # is a Zipf heavy hitter
    term_hot_salts: int = 8             # sub-buckets a hot term's instance
                                        # rows spread across (LM/NB exchanges)
    driver_fold_buckets: int = 64       # worker-side pre-fold width for
                                        # driver-bound partial rows (Gram
                                        # blobs, BM25 stats): the driver
                                        # receives <= this many rows, not
                                        # one per batch
    tfidf_scale: int = 1000             # integer idf units: (N*scale)//df
    term_index_buckets: int = 64        # hive partitions of the term index
                                        # (raise at scale: 1 partition ≈ one
                                        # object-store-friendly chunk)
    bitext_topk: int = 4                # bitext mining: candidates in each
                                        # side's margin normalizer
    bitext_margin_bp: int = 10_000      # ...mined-pair margin threshold
                                        # (basis points; 10000 = ratio 1.0)

    # keyword / skip constants (tuples so the dataclass stays hashable)
    keywords: tuple[str, ...] = ADDITIONAL_INTEREST_KEYWORDS
    dollar_skip_patterns: tuple[str, ...] = DOLLAR_SKIP_PATTERNS


DEFAULT_CONFIG = PipelineConfig()
