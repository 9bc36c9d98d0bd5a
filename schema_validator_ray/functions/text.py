"""Text-analysis kernels for the documents table: token counting, quality
scoring, language-ID heuristic, document fingerprinting, shingling.

All batch-vectorized where Arrow has a kernel (token counts, lengths, ratios via
RE2 ``count_substring_regex``); the per-doc set operations (shingles, minhash)
use numpy inside a batch loop — they feed the dedup stages, which are actor-pool
``map_batches`` stages.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .sketches import hash64_ints

# RE2 \w == [0-9A-Za-z_] — same class DuckDB uses, so the SQL oracle can express
# token_count as len(regexp_extract_all(text, '\w+')) exactly.
TOKEN_RE = r"\w+"

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "you", "that"},
    "de": {"der", "die", "das", "und", "ist", "ich", "nicht", "ein", "zu", "mit"},
    "fr": {"le", "la", "les", "et", "est", "je", "pas", "un", "une", "dans"},
    "es": {"el", "la", "los", "y", "es", "yo", "no", "un", "una", "en"},
}


def token_count(col: pa.Array) -> pa.Array:
    """Whitespace-free token count: number of \\w+ matches (int64)."""
    return pc.cast(pc.count_substring_regex(
        pc.fill_null(col, ""), TOKEN_RE), pa.int64())


def char_stats(col: pa.Array) -> dict[str, pa.Array]:
    """Vectorized per-doc character statistics used by the quality score."""
    s = pc.fill_null(col, "")
    n = pc.cast(pc.utf8_length(s), pa.float64())
    safe_n = pc.max_element_wise(n, 1.0)
    alpha = pc.cast(pc.count_substring_regex(s, r"[A-Za-z]"), pa.float64())
    digit = pc.cast(pc.count_substring_regex(s, r"[0-9]"), pa.float64())
    punct = pc.cast(pc.count_substring_regex(s, r"[^\w\s]"), pa.float64())
    space = pc.cast(pc.count_substring_regex(s, r"\s"), pa.float64())
    upper = pc.cast(pc.count_substring_regex(s, r"[A-Z]"), pa.float64())
    return {
        "n_chars": pc.cast(n, pa.int64()),
        "alpha_ratio": pc.divide(alpha, safe_n),
        "digit_ratio": pc.divide(digit, safe_n),
        "punct_ratio": pc.divide(punct, safe_n),
        "space_ratio": pc.divide(space, safe_n),
        "upper_ratio": pc.divide(upper, safe_n),
    }


def quality_score(col: pa.Array) -> pa.Array:
    """[0,1] heuristic quality score: length band + alpha ratio − punct/upper
    excess. Deterministic, fully vectorized; the exact formula is pinned by tests
    and reproduced in SQL for the oracle."""
    stats = char_stats(col)
    n = pc.cast(stats["n_chars"], pa.float64())
    len_score = pc.min_element_wise(pc.divide(n, 200.0), 1.0)
    score = pc.add(
        pc.multiply(0.4, len_score),
        pc.add(pc.multiply(0.4, stats["alpha_ratio"]),
               pc.multiply(0.2, pc.subtract(
                   1.0, pc.min_element_wise(
                       pc.multiply(stats["punct_ratio"], 4.0), 1.0)))))
    return pc.round(score, ndigits=6)


def char_entropy(col: pa.Array) -> pa.Array:
    """Per-document Shannon entropy (bits) of the code-point distribution —
    the classic gibberish / low-diversity filter (near-0 = one repeated
    char, English prose ≈ 4–4.5). Vectorized across the whole batch: one
    utf-32 decode of the concatenated text, one ``np.unique`` over
    (row, code-point) composite keys, segment-summed log2 contributions —
    no Python loop over rows or characters. Matches SQL
    ``entropy(unnest(string_split(text, '')))`` (log2) to 6dp; empty
    strings score 0.0 (a 1-element multiset also has entropy 0)."""
    vals = col.to_numpy(zero_copy_only=False)
    n = len(vals)
    texts = ["" if v is None else v for v in vals]
    lens = np.fromiter((len(t) for t in texts), np.int64, n)
    out = np.zeros(n, np.float64)
    total = int(lens.sum())
    if total:
        cp = np.frombuffer("".join(texts).encode("utf-32-le"), np.uint32)
        parent = np.repeat(np.arange(n, dtype=np.uint64), lens)
        key = (parent << np.uint64(21)) | cp.astype(np.uint64)  # cp < 2^21
        uniq, counts = np.unique(key, return_counts=True)
        up = (uniq >> np.uint64(21)).astype(np.int64)
        p = counts / lens[up]
        np.add.at(out, up, -p * np.log2(p))
    return pa.array(np.round(out, 6), pa.float64())


def lang_id(col: pa.Array) -> pa.Array:
    """Heuristic language ID: CJK character fraction -> "zh"; Cyrillic -> "ru";
    else argmax of per-language stopword hits; ties/no-hits -> "und"."""
    s = pc.fill_null(col, "")
    n = pc.cast(pc.utf8_length(s), pa.float64())
    safe_n = pc.max_element_wise(n, 1.0)
    cjk = pc.divide(pc.cast(pc.count_substring_regex(
        s, r"[\x{4e00}-\x{9fff}]"), pa.float64()), safe_n)
    cyr = pc.divide(pc.cast(pc.count_substring_regex(
        s, r"[\x{0400}-\x{04ff}]"), pa.float64()), safe_n)
    lower = pc.utf8_lower(s)
    hits = {}
    for lang, words in _STOPWORDS.items():
        pat = r"\b(" + "|".join(sorted(words)) + r")\b"
        hits[lang] = pc.count_substring_regex(lower, pat).to_numpy(
            zero_copy_only=False)
    langs = sorted(_STOPWORDS)
    mat = np.vstack([hits[l] for l in langs])
    best = mat.argmax(axis=0)
    best_hits = mat.max(axis=0)
    out = np.array([langs[i] for i in best], dtype=object)
    out[best_hits == 0] = "und"
    cjk_np = cjk.to_numpy(zero_copy_only=False)
    cyr_np = cyr.to_numpy(zero_copy_only=False)
    out[cyr_np > 0.2] = "ru"
    out[cjk_np > 0.2] = "zh"
    return pa.array(out, type=pa.string())


def content_hash(col: pa.Array) -> pa.Array:
    """Stable 64-bit content hash (hex) of the exact bytes — exact-dedup key.
    blake2b-8; DuckDB oracle uses md5 comparisons instead, so queries compare
    group structure, not hash values."""
    vals = pc.fill_null(col, "").to_pylist()
    return pa.array(
        [hashlib.blake2b(v.encode(), digest_size=8).hexdigest() for v in vals],
        type=pa.string())


def fingerprint64(col: pa.Array, window: int = 8) -> pa.Array:
    """Winnowing-style document fingerprint: min rolling-hash over byte
    ``window``-grams, avalanched. Similar-prefix docs get unrelated prints;
    identical docs identical prints (int64)."""
    vals = pc.fill_null(col, "").to_pylist()
    out = np.empty(len(vals), np.int64)
    for i, v in enumerate(vals):
        b = np.frombuffer(v.encode(), dtype=np.uint8)
        if len(b) < window:
            h = int.from_bytes(hashlib.blake2b(v.encode(), digest_size=8).digest(),
                               "little")
            out[i] = np.uint64(h).astype(np.int64)
            continue
        # rolling polynomial hash over sliding windows, vectorized
        k = len(b) - window + 1
        mat = np.lib.stride_tricks.sliding_window_view(b, window).astype(np.uint64)
        weights = np.power(np.uint64(257), np.arange(window, dtype=np.uint64),
                           dtype=np.uint64)
        hashes = (mat * weights).sum(axis=1, dtype=np.uint64)
        out[i] = hash64_ints(hashes).min().astype(np.int64)
    return pa.array(out, type=pa.int64())


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Hashed character k-gram set (uint64, deduplicated)."""
    b = np.frombuffer(text.encode(), dtype=np.uint8)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)), constant_values=32)
    mat = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    weights = np.power(np.uint64(1315423911), np.arange(k, dtype=np.uint64),
                       dtype=np.uint64)
    return np.unique(hash64_ints((mat * weights).sum(axis=1, dtype=np.uint64)))


def word_shingles(text: str, k: int = 3) -> np.ndarray:
    """Hashed word k-gram set (uint64, deduplicated)."""
    import re

    toks = re.findall(r"\w+", text.lower())
    if not toks:
        return np.empty(0, np.uint64)
    hs = np.fromiter(
        (int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(),
                        "little") for t in toks), np.uint64, len(toks))
    if len(hs) < k:
        return np.unique(hash64_ints(hs))
    mat = np.lib.stride_tricks.sliding_window_view(hs, k)
    weights = np.power(np.uint64(0x100000001B3), np.arange(k, dtype=np.uint64),
                       dtype=np.uint64)
    return np.unique(hash64_ints((mat * weights).sum(axis=1, dtype=np.uint64)))


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


# ---------------------------------------------------------------------------
# cleaning / redaction (training-data preprocessing; all RE2-expressible so
# the DuckDB oracle reproduces them exactly)

HTML_TAG_RE = r"<[^>]*>"
CONTROL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
WS_RE = r"\s+"
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
# 7+ digit runs with optional separators — deliberately simple and identical
# in both engines; a production redactor would add locale-aware patterns here
PHONE_RE = r"\+?[0-9][0-9()\-\. ]{5,}[0-9]"


def clean_text(col: pa.Array) -> pa.Array:
    """Strip HTML tags, drop control characters, collapse whitespace runs to
    one space, trim. Pure RE2 pipeline (vectorized, zero Python loops)."""
    s = pc.fill_null(col, "")
    s = pc.replace_substring_regex(s, HTML_TAG_RE, " ")
    s = pc.replace_substring_regex(s, CONTROL_RE, "")
    s = pc.replace_substring_regex(s, WS_RE, " ")
    # ascii trim == DuckDB trim() after the \s+ collapse (RE2 \s is ASCII,
    # so edges hold at most a plain space; unicode-aware trim would diverge)
    return pc.ascii_trim_whitespace(s)


def redact_pii(col: pa.Array) -> dict[str, pa.Array]:
    """Replace emails/phone-like runs with placeholders; returns the redacted
    column plus per-row counts of each replacement."""
    s = pc.fill_null(col, "")
    n_email = pc.cast(pc.count_substring_regex(s, EMAIL_RE), pa.int64())
    s = pc.replace_substring_regex(s, EMAIL_RE, "[EMAIL]")
    n_phone = pc.cast(pc.count_substring_regex(s, PHONE_RE), pa.int64())
    s = pc.replace_substring_regex(s, PHONE_RE, "[PHONE]")
    return {"text": s, "n_email": n_email, "n_phone": n_phone}


WORD_SPLIT_RE = r"[^a-z0-9]+"


def word_count_partial(col: pa.Array | pa.ChunkedArray) -> pa.Table:
    """Per-batch (word, cnt) partial: lowercase, split on non-alphanumeric
    runs, flatten, drop empties, count — all Arrow kernels. The regex matches
    DuckDB's ``regexp_split_to_array(lower(text), '[^a-z0-9]+')`` exactly so
    the oracle reproduces the tokenization bit-for-bit."""
    toks = pc.split_pattern_regex(pc.utf8_lower(col), WORD_SPLIT_RE)
    flat = pc.list_flatten(toks)
    flat = flat.filter(pc.not_equal(flat, ""))
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    agg = pa.table({"word": flat}).group_by("word").aggregate(
        [([], "count_all")])
    return pa.table({"word": agg["word"],
                     "cnt": pc.cast(agg["count_all"], pa.int64())})


def vocab_topk(ds, text_col: str, k: int = 50, *,
               reduce_partitions: int = 8):
    """Top-k corpus vocabulary by frequency (ties broken by word, ascending —
    deterministic). Distributed shape: per-batch (word, cnt) partials bound
    the shuffle at the batch vocabulary (not token count); a groupby-sum
    merges them; the final sort+limit runs over vocabulary-sized data."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        return word_count_partial(b[text_col])

    totals = (ds.map_batches(partial, batch_format="pyarrow")
              .repartition(reduce_partitions)
              .groupby("word").aggregate(Sum("cnt", alias_name="cnt")))
    return totals.sort(["cnt", "word"], descending=[True, False]).limit(k)


_BCAST_VOCAB_CACHE: dict = {}


def _vocab_cached(ref) -> np.ndarray:
    """Per-process cache for the broadcast vocabulary (one entry held)."""
    hexid = ref.hex()
    ent = _BCAST_VOCAB_CACHE.get(hexid)
    if ent is None:
        import ray

        ent = ray.get(ref)
        _BCAST_VOCAB_CACHE.clear()
        _BCAST_VOCAB_CACHE[hexid] = ent
    return ent


def oov_filter(ds, text_col: str, id_col: str, *, vocab_k: int = 50,
               max_oov_frac: float = 0.5):
    """Vocabulary-coverage filter: drop documents whose out-of-vocabulary
    token fraction exceeds ``max_oov_frac``, where the vocabulary is the
    corpus's own top-``vocab_k`` words (count desc, word asc tie-break —
    deterministic). The standard "does this doc look like the target
    distribution?" cheap gate run before expensive scoring stages.

    Distributed shape: pass 1 is ``vocab_topk`` (per-batch (word, cnt)
    partials bound the exchange at batch vocabulary); the resulting k rows
    are a k-bounded driver collect broadcast once via ``ray.put`` (read per
    worker process, never re-shipped per batch). Pass 2 is map-only: one
    sorted-membership searchsorted probe per batch, no shuffle. Emits
    ``(id, n_tokens, oov_frac)`` for surviving docs (>= 1 token and
    oov_frac <= threshold)."""
    import ray

    vocab_rows = vocab_topk(ds, text_col, vocab_k).take(vocab_k)  # k-bounded
    vocab = np.sort(np.array([r["word"] for r in vocab_rows], dtype=object))
    ref = ray.put(vocab)

    def score(b: pa.Table) -> pa.Table:
        vv = _vocab_cached(ref)
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(b[text_col], "")), WORD_SPLIT_RE)
        tp = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
        tflat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        keep = tflat != ""
        tp, tflat = tp[keep], tflat[keep]
        n = np.bincount(tp, minlength=b.num_rows).astype(np.int64)
        if len(vv) and len(tflat):
            pos = np.searchsorted(vv, tflat)
            pos[pos == len(vv)] = 0
            inv = vv[pos] == tflat
        else:
            inv = np.zeros(len(tflat), bool)
        oov = np.bincount(tp[~inv], minlength=b.num_rows).astype(np.int64)
        frac = oov.astype(np.float64) / np.maximum(n, 1).astype(np.float64)
        mask = (n > 0) & (frac <= max_oov_frac)
        out = pa.table({id_col: b[id_col],
                        "n_tokens": pa.array(n, pa.int64()),
                        "oov_frac": pa.array(frac, pa.float64())})
        return out.filter(pa.array(mask))

    return ds.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# repetition / diversity metrics (Gopher-style quality filters; see Rae et al.
# 2021 "Scaling Language Models" §A1.1 repetition heuristics — public paper)


def _per_row_group_stats(parents: np.ndarray, values: np.ndarray,
                         n_rows: int) -> tuple[np.ndarray, np.ndarray]:
    """(distinct count, max group size) of ``values`` within each parent row.

    Vectorized: factorize values globally, build a (row, code) composite
    int64, one np.unique(return_counts) pass gives both per-row distinct
    counts and the per-row most-frequent-value count."""
    d = np.zeros(n_rows, np.int64)
    mx = np.zeros(n_rows, np.int64)
    if len(values) == 0:
        return d, mx
    import pandas as pd

    codes, uniques = pd.factorize(values)
    width = np.int64(len(uniques))
    comp = parents.astype(np.int64) * width + codes
    uq, counts = np.unique(comp, return_counts=True)
    rows = (uq // width).astype(np.int64)
    d[:] = np.bincount(rows, minlength=n_rows)
    np.maximum.at(mx, rows, counts)
    return d, mx


def repetition_stats(col: pa.Array | pa.ChunkedArray) -> dict[str, pa.Array]:
    """Per-doc repetition metrics (all exactly SQL-reproducible):

    - ``n_lines``        — count of '\\n'-separated lines (>= 1, like SQL
      string_split which yields [''] for empty text)
    - ``dup_line_frac``  — 1 - distinct_lines / n_lines
    - ``dup_token_frac`` — 1 - distinct_tokens / n_tokens (0.0 if no tokens);
      tokens are the WORD_SPLIT_RE lowercase tokenization shared with
      vocab_topk so the DuckDB oracle matches bit-for-bit
    - ``top_token_frac`` — occurrences of the most frequent token / n_tokens
      (0.0 if no tokens)

    Fully vectorized: Arrow splits + one factorize/unique pass per metric —
    no per-document Python loop."""
    s = pc.fill_null(col, "")
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    n_rows = len(s)

    lines = pc.split_pattern(s, "\n")
    n_lines = np.asarray(pc.list_value_length(lines), dtype=np.int64)
    lp = np.asarray(pc.list_parent_indices(lines), dtype=np.int64)
    lflat = pc.list_flatten(lines).to_numpy(zero_copy_only=False)
    d_lines, _ = _per_row_group_stats(lp, lflat, n_rows)

    toks = pc.split_pattern_regex(pc.utf8_lower(s), WORD_SPLIT_RE)
    tp = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
    tflat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
    keep = tflat != ""
    tp, tflat = tp[keep], tflat[keep]
    n_toks = np.bincount(tp, minlength=n_rows).astype(np.int64)
    d_toks, mx_toks = _per_row_group_stats(tp, tflat, n_rows)

    dup_line = 1.0 - d_lines.astype(np.float64) / n_lines.astype(np.float64)
    safe = np.maximum(n_toks, 1).astype(np.float64)
    dup_tok = np.where(n_toks > 0,
                       1.0 - d_toks.astype(np.float64) / safe, 0.0)
    top_tok = np.where(n_toks > 0, mx_toks.astype(np.float64) / safe, 0.0)
    return {
        "n_lines": pa.array(n_lines, pa.int64()),
        "dup_line_frac": pa.array(dup_line, pa.float64()),
        "dup_token_frac": pa.array(dup_tok, pa.float64()),
        "top_token_frac": pa.array(top_tok, pa.float64()),
    }


def ngram_repetition_stats(col: pa.Array | pa.ChunkedArray,
                           k: int = 2) -> dict[str, pa.Array]:
    """Per-doc duplicate word-k-gram metrics (Rae et al. 2021 §A1.1's
    "fraction of duplicate n-grams" rule — the n-gram level that
    ``repetition_stats`` (token/line level) does not cover):

    - ``n_ngrams``        — count of word k-grams (0 if < k tokens)
    - ``dup_ngram_frac``  — 1 - distinct_kgrams / n_ngrams (0.0 if none)
    - ``top_ngram_frac``  — occurrences of the most frequent k-gram /
      n_ngrams (0.0 if none)

    Tokenization and k-gram construction are ``word_kgrams`` (shared with
    decontamination / the MinHash shingler), so the DuckDB oracle —
    ``array_to_string(toks[i : i + k - 1], ' ')`` over
    ``regexp_split_to_array(lower(text), '[^a-z0-9]+')`` — matches
    bit-for-bit. Fully vectorized: one shifted-view Arrow join + one
    factorize/unique pass, no per-document Python loop. Map-only."""
    s = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n_rows = len(s)
    rows, grams = word_kgrams(s, k)
    n = np.bincount(rows, minlength=n_rows).astype(np.int64)
    gflat = grams.to_numpy(zero_copy_only=False)
    d, mx = _per_row_group_stats(rows, gflat, n_rows)
    safe = np.maximum(n, 1).astype(np.float64)
    dup = np.where(n > 0, 1.0 - d.astype(np.float64) / safe, 0.0)
    top = np.where(n > 0, mx.astype(np.float64) / safe, 0.0)
    return {
        "n_ngrams": pa.array(n, pa.int64()),
        "dup_ngram_frac": pa.array(dup, pa.float64()),
        "top_ngram_frac": pa.array(top, pa.float64()),
    }


def word_kgrams(col: pa.Array | pa.ChunkedArray, k: int) -> tuple[
        np.ndarray, pa.Array]:
    """All word k-gram strings of every row — vectorized, no per-doc loop.

    Tokenization is the shared WORD_SPLIT_RE lowercase split (bit-identical
    to DuckDB ``regexp_split_to_array(lower(text), '[^a-z0-9]+')``); k-grams
    are the space-joined runs of k consecutive tokens within one row
    (DuckDB ``array_to_string(toks[i:i+k-1], ' ')``). Returns
    ``(row_indices, shingles)`` aligned arrays; rows with fewer than k
    tokens contribute nothing. The join is one Arrow
    ``binary_join_element_wise`` over k shifted views of the flattened
    token array — zero Python-level string work."""
    s = pc.fill_null(col, "")
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_lower(s), WORD_SPLIT_RE)
    tp = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
    tflat = pc.list_flatten(toks)
    if isinstance(tflat, pa.ChunkedArray):
        tflat = tflat.combine_chunks()
    mask = pc.not_equal(tflat, "")
    tp = tp[np.asarray(mask, dtype=bool)] if len(tp) else tp
    tflat = tflat.filter(mask)
    n = len(tp)
    if n < k:
        return np.empty(0, np.int64), pa.array([], pa.string())
    valid = tp[: n - k + 1] == tp[k - 1:]
    shifted = [tflat.slice(off, n - k + 1) for off in range(k)]
    joined = pc.binary_join_element_wise(*shifted, " ")
    return tp[: n - k + 1][valid], joined.filter(pa.array(valid))


def tfidf_top_terms(ds, text_col: str, id_col: str, k: int = 3, *,
                    vocab_broadcast_max: int = 5_000_000):
    """Top-k TF-IDF terms per document (ties: higher score, then word asc).

    Two passes, both bounded: (1) document frequency — per-batch per-doc
    DISTINCT words reduce to (word, df) partials, groupby-summed, then the
    vocabulary (NOT the corpus) streams to the driver under
    ``vocab_broadcast_max`` and broadcasts once via ``ray.put`` as sorted
    word/idf arrays (over budget the run fails loudly; the documented
    fallback is a hash join of scores against the df table); (2) scoring —
    map-only: per-batch (doc, word, tf) via Arrow group_by, idf looked up
    with one searchsorted, per-doc top-k selected with sort_indices + a
    run-position mask (no row loop). Scores round to 6dp on BOTH sides
    before ranking so last-ulp libm noise cannot flip a tie.

    Tokenization is ``WORD_SPLIT_RE`` (lowercase, [^a-z0-9]+ splits) —
    bit-identical to the DuckDB oracle's regexp_split_to_array."""
    import ray
    from ray.data.aggregate import Sum

    def df_partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(b[text_col]),
                                      WORD_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        t = pa.table({"d": parent, "word": flat}).filter(
            pc.not_equal(flat, ""))
        uniq = t.group_by(["d", "word"]).aggregate([])
        agg = uniq.group_by("word").aggregate([([], "count_all")])
        return pa.table({"word": agg["word"],
                         "df": pc.cast(agg["count_all"], pa.int64())})

    dfs = (ds.map_batches(df_partial, batch_format="pyarrow")
           .groupby("word").aggregate(Sum("df", alias_name="df")))
    parts, total = [], 0
    for b in dfs.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        parts.append(b)
        total += b.num_rows
        if total > vocab_broadcast_max:
            raise MemoryError(
                f"vocabulary exceeds broadcast budget ({vocab_broadcast_max});"
                " join scores against the df table instead")
    n_docs = ds.count()
    if parts:
        vocab = pa.concat_tables(parts).sort_by("word")
        # numpy '<U' dtype: C string compares in searchsorted (tokens are
        # ASCII [a-z0-9]+ so '<U' order == Arrow's UTF-8 byte order)
        words = (vocab["word"].to_numpy(zero_copy_only=False)
                 .astype(str))
        idf = np.log(float(n_docs)
                     / vocab["df"].to_numpy(zero_copy_only=False)
                     .astype(np.float64))
    else:
        words, idf = np.array([], "<U1"), np.array([], np.float64)
    ref = ray.put((words, idf))

    def score(b: pa.Table) -> pa.Table:
        w_sorted, idf_v = ray.get(ref)
        toks = pc.split_pattern_regex(pc.utf8_lower(b[text_col]),
                                      WORD_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        t = pa.table({"p": parent, "word": flat}).filter(
            pc.not_equal(flat, ""))
        tf = t.group_by(["p", "word"]).aggregate([([], "count_all")])
        wv = tf["word"].to_numpy(zero_copy_only=False).astype(str)
        pos = np.searchsorted(w_sorted, wv) if len(w_sorted) else \
            np.zeros(len(wv), np.int64)
        s = np.round(tf["count_all"].to_numpy(zero_copy_only=False)
                     .astype(np.float64) * idf_v[pos], 6) if len(w_sorted) \
            else np.zeros(len(wv), np.float64)
        st = pa.table({"p": tf["p"], "word": tf["word"],
                       "score": pa.array(s, pa.float64())})
        idx = pc.sort_indices(st, sort_keys=[
            ("p", "ascending"), ("score", "descending"),
            ("word", "ascending")])
        st = st.take(idx)
        pv = st["p"].to_numpy(zero_copy_only=False)
        brk = np.r_[True, pv[1:] != pv[:-1]]
        seg = np.flatnonzero(brk)
        rankpos = np.arange(len(pv)) - seg[np.cumsum(brk) - 1]
        st = st.filter(pa.array(rankpos < k))
        ids = b[id_col].take(st["p"])
        return pa.table({id_col: ids, "term": st["word"],
                         "score": st["score"]})

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow")


def nfc_normalize_column(col) -> tuple:
    """Unicode NFC normalization of a string column → (normalized array,
    changed mask). Parity: python's ``unicodedata.normalize('NFC', s)``
    and DuckDB's ``nfc_normalize`` both implement Unicode NFC, so the SQL
    oracle is exact. Fast path: a pure-ASCII string is NFC by definition —
    one vectorized byte-length==char-length check skips the per-row call
    for the (dominant, in web text) ASCII mass. NULL → ''."""
    import unicodedata

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    s = pc.coalesce(pc.cast(col, pa.string()), "")
    ascii_mask = pc.equal(pc.binary_length(s), pc.utf8_length(s))
    vals = s.to_pylist()
    changed = np.zeros(len(vals), bool)
    for i, is_ascii in enumerate(ascii_mask.to_numpy(
            zero_copy_only=False)):
        if is_ascii:
            continue
        n = unicodedata.normalize("NFC", vals[i])
        if n != vals[i]:
            vals[i] = n
            changed[i] = True
    return pa.array(vals, pa.string()), pa.array(changed)


def unigram_logprob_score(ds, text_col: str, id_col: str, *,
                          vocab_max: int = 2_000_000,
                          out_col: str = "avg_logprob"):
    """CCNet-style perplexity filter with a unigram stand-in LM: score
    each doc by the MEAN ln P(token) under the corpus's own unigram
    distribution (low = rare/garbled text; the real thing swaps a KenLM
    in at the scoring seam — the two-pass shape is identical). Zero-token
    docs are excluded (SQL join semantics).

    Pass 1: corpus token counts — per-batch (word, cnt) partials bounded
    by batch VOCABULARY (never token count) → groupby sum → driver merge
    under a loud ``vocab_max`` budget; the (sorted words, logprob) arrays
    broadcast once. Pass 2 is map-only: tokens resolve by searchsorted,
    per-doc means by one ``np.add.at`` over list-parent indices. OOV
    tokens (scoring a dataset other than the training corpus) take the
    floor logprob ln(0.5/N)."""
    import ray
    from ray.data.aggregate import Sum

    from ..stages._collect import collect_up_to

    narrow = ds.select_columns([id_col, text_col])
    counts = (narrow.map_batches(
        lambda b: word_count_partial(b[text_col]), batch_format="pyarrow")
        .groupby("word").aggregate(Sum("cnt", alias_name="cnt")))
    parts, over = collect_up_to(counts, vocab_max)
    if over:
        raise ValueError(
            f"unigram_logprob_score: corpus vocabulary exceeds vocab_max="
            f"{vocab_max} — raise the budget or pre-trim the vocabulary")
    if not parts:
        return narrow.map_batches(
            lambda b: pa.table({id_col: b[id_col].slice(0, 0),
                                out_col: pa.array([], pa.float64())}),
            batch_format="pyarrow")
    vt = pa.concat_tables(parts)
    words = vt["word"].to_numpy(zero_copy_only=False)
    cnts = vt["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.argsort(words, kind="stable")
    words, cnts = words[order], cnts[order]
    total = cnts.sum()
    logp = np.log(cnts / total)
    floor = float(np.log(0.5 / total))
    ref = ray.put((words, logp))

    def score(b: pa.Table) -> pa.Table:
        import ray as _ray

        w_sorted, lp = _ray.get(ref)
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(b[text_col], "")), WORD_SPLIT_RE)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        fw = flat.to_numpy(zero_copy_only=False)[keep]
        parents = parents[keep]
        n_docs = b.num_rows
        if len(fw):
            idx = np.searchsorted(w_sorted, fw)
            idx[idx == len(w_sorted)] = 0
            v = np.where(w_sorted[idx] == fw, lp[idx], floor)
            s = np.zeros(n_docs)
            c = np.zeros(n_docs)
            np.add.at(s, parents, v)
            np.add.at(c, parents, 1.0)
        else:
            s = np.zeros(n_docs)
            c = np.zeros(n_docs)
        has = c > 0
        out = pa.table({id_col: b[id_col],
                        out_col: pa.array(
                            np.divide(s, c, out=np.zeros(n_docs),
                                      where=has))})
        return out.filter(pa.array(has))

    return narrow.map_batches(score, batch_format="pyarrow")


def _bigram_arrays(col):
    """Tokenize a string column (lower, split on non-[a-z0-9], drop
    empties) and return the surviving-token adjacency pairs as
    (w1, w2, parent_doc_index) numpy arrays — the shared kernel of both
    bigram passes, so counting and scoring cannot drift apart."""
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(col, "")), WORD_SPLIT_RE)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    fw = flat.to_numpy(zero_copy_only=False)[keep]
    parents = parents[keep]
    if len(fw) < 2:
        e = np.array([], object)
        return e, e, np.array([], np.int64)
    adj = parents[1:] == parents[:-1]
    return fw[:-1][adj], fw[1:][adj], parents[:-1][adj]


def bigram_logprob_score(ds, text_col: str, id_col: str, *,
                         vocab_max: int = 4_000_000,
                         out_col: str = "avg_bigram_logprob"):
    """CCNet-style LM quality score, one order up from
    ``unigram_logprob_score``: each doc's MEAN ln P(w2 | w1) under the
    corpus's own bigram MLE — repetitive or formulaic text scores high,
    shuffled/garbled word soup scores low even when every individual
    word is common (which the unigram score cannot see). Docs with <2
    tokens are excluded (no pairs; SQL join semantics).

    Pass 1: per-batch (w1, w2, cnt) partials bounded by batch BIGRAM
    vocabulary (never pair count) → groupby sum → driver merge under a
    loud ``vocab_max`` budget; the conditional denominator c(w1·) is a
    per-w1 sum over the collected table (no second counting pass). The
    sorted pair-key + logprob arrays broadcast once. Pass 2 is map-only:
    pairs resolve by searchsorted, per-doc means by ``np.add.at``.
    Unseen pairs (scoring outside the training corpus) take the floor
    ln(0.5 / total_pairs)."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    from ..stages._collect import collect_up_to

    narrow = ds.select_columns([id_col, text_col])

    def pair_partial(b: pa.Table) -> pa.Table:
        w1, w2, _ = _bigram_arrays(b[text_col])
        t = pa.table({"w1": pa.array(w1, pa.string()),
                      "w2": pa.array(w2, pa.string())})
        agg = t.group_by(["w1", "w2"]).aggregate([([], "count_all")])
        return pa.table({"w1": agg["w1"], "w2": agg["w2"],
                         "cnt": pc.cast(agg["count_all"], pa.int64())})

    counts = (narrow.map_batches(pair_partial, batch_format="pyarrow")
              .groupby(["w1", "w2"]).aggregate(Sum("cnt", alias_name="cnt")))
    parts, over = collect_up_to(counts, vocab_max)
    if over:
        raise ValueError(
            f"bigram_logprob_score: corpus bigram vocabulary exceeds "
            f"vocab_max={vocab_max} — raise the budget or pre-trim")
    if not parts:
        return narrow.map_batches(
            lambda b: pa.table({id_col: b[id_col].slice(0, 0),
                                out_col: pa.array([], pa.float64())}),
            batch_format="pyarrow")
    vt = pa.concat_tables(parts)
    w1 = vt["w1"].to_numpy(zero_copy_only=False)
    w2 = vt["w2"].to_numpy(zero_copy_only=False)
    cnt = vt["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
    # conditional denominator c(w1·): per-w1 sum over the (vocab-bounded)
    # collected table — not a second distributed pass
    codes, uniq = pd.factorize(w1)
    denom = np.zeros(len(uniq))
    np.add.at(denom, codes, cnt)
    logp = np.log(cnt / denom[codes])
    keys = w1 + " " + w2                        # tokens never contain ' '
    order = np.argsort(keys, kind="stable")
    keys, logp = keys[order], logp[order]
    floor = float(np.log(0.5 / cnt.sum()))
    ref = ray.put((keys, logp))

    def score(b: pa.Table) -> pa.Table:
        import ray as _ray

        k_sorted, lp = _ray.get(ref)
        p1, p2, parents = _bigram_arrays(b[text_col])
        n_docs = b.num_rows
        s = np.zeros(n_docs)
        c = np.zeros(n_docs)
        if len(p1):
            pk = p1 + " " + p2
            idx = np.searchsorted(k_sorted, pk)
            idx[idx == len(k_sorted)] = 0
            v = np.where(k_sorted[idx] == pk, lp[idx], floor)
            np.add.at(s, parents, v)
            np.add.at(c, parents, 1.0)
        has = c > 0
        out = pa.table({id_col: b[id_col],
                        out_col: pa.array(
                            np.divide(s, c, out=np.zeros(n_docs),
                                      where=has))})
        return out.filter(pa.array(has))

    return narrow.map_batches(score, batch_format="pyarrow")


def source_unigram_jsd(ds, text_col: str, group_col: str, *,
                       cell_max: int = 5_000_000):
    """Pairwise Jensen–Shannon divergence between the unigram
    distributions of each ``group_col`` value — the domain-shift /
    source-similarity signal behind mixing decisions ("these two crawls
    are near-identical; don't double-weight them"). Natural-log JSD in
    [0, ln 2]; 0 = identical distributions.

    Movement: per-batch (group, word, cnt) partials (bounded by batch
    vocabulary × groups present in the batch) → one groupby-sum → the
    |groups|×|vocab| cell table reaches the driver under a loud
    ``cell_max`` budget; the pairwise JSD is a dense |groups|²×|vocab|
    numpy pass. A million-word vocabulary across hundreds of sources is
    not a driver-sized question — the budget says so loudly."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages._collect import collect_up_to

    def partial(b: pa.Table) -> pa.Table:
        grp = pc.fill_null(pc.cast(b[group_col], pa.string()), "")
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(b[text_col], "")), WORD_SPLIT_RE)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        g = pc.take(grp, parents)
        t = pa.table({"g": g, "w": flat}).filter(pc.not_equal(flat, ""))
        agg = t.group_by(["g", "w"]).aggregate([([], "count_all")])
        return pa.table({"g": agg["g"], "w": agg["w"],
                         "cnt": pc.cast(agg["count_all"], pa.int64())})

    cells = (ds.select_columns([group_col, text_col])
             .map_batches(partial, batch_format="pyarrow")
             .groupby(["g", "w"]).aggregate(Sum("cnt", alias_name="cnt")))
    parts, over = collect_up_to(cells, cell_max)
    empty = pa.table({"source_a": pa.array([], pa.string()),
                      "source_b": pa.array([], pa.string()),
                      "jsd": pa.array([], pa.float64())})
    if over:
        raise ValueError(
            f"source_unigram_jsd: |groups|x|vocab| cells exceed cell_max="
            f"{cell_max} — trim the vocabulary (top-k) or raise the budget")
    if not parts:
        return rd.from_arrow(empty)
    df = pa.concat_tables(parts).to_pandas()
    piv = df.pivot_table(index="w", columns="g", values="cnt",
                         aggfunc="sum", fill_value=0.0)
    P = piv.to_numpy(np.float64)
    P = P / P.sum(axis=0, keepdims=True)
    groups = list(piv.columns)
    rows_a, rows_b, rows_j = [], [], []
    for i in range(len(groups)):
        for j in range(i + 1, len(groups)):
            p, q = P[:, i], P[:, j]
            m = 0.5 * (p + q)
            kl_p = np.sum(np.where(p > 0, p * np.log(
                np.divide(p, m, out=np.ones_like(p), where=m > 0)), 0.0))
            kl_q = np.sum(np.where(q > 0, q * np.log(
                np.divide(q, m, out=np.ones_like(q), where=m > 0)), 0.0))
            rows_a.append(groups[i])
            rows_b.append(groups[j])
            rows_j.append(0.5 * kl_p + 0.5 * kl_q)
    return rd.from_arrow(pa.table({
        "source_a": pa.array(rows_a, pa.string()),
        "source_b": pa.array(rows_b, pa.string()),
        "jsd": pa.array(rows_j, pa.float64())}))


def term_burstiness(ds, text_col: str, *, k: int = 20):
    """Variance-to-mean ratio (Fano factor) of per-document counts for the
    corpus's top-``k`` terms — the burstiness signal separating topical
    content words (bursty, VMR ≫ 1) from function words (Poisson-ish,
    VMR ≈ 1); a drift in a common term's VMR flags templating or spam.
    Zero-count documents are part of the distribution: mean = Σx/N over ALL
    N docs, var = (Σx² − (Σx)²/N)/(N−1).

    Distributed shape: a document's tokens live in its own row, so per-doc
    counts are exact within a batch — per-batch (word, Σx, Σx²) partials
    bound the exchange at batch vocabulary; one groupby-sum merges; the
    top-k pick is a vocabulary-sized sort+limit; the k-row finish closes
    over the scalar doc count. The formula is spelled identically in the
    SQL oracle; 6dp rounding absorbs int→double conversion ulps."""
    from ray.data.aggregate import Sum

    n_docs = float(ds.count())

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(b[text_col], "")), WORD_SPLIT_RE)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        t = pa.table({"p": parents, "w": flat}).filter(
            pc.not_equal(flat, ""))
        cnt = t.group_by(["p", "w"]).aggregate([([], "count_all")])
        x = pc.cast(cnt["count_all"], pa.int64())
        per = pa.table({"w": cnt["w"], "x": x,
                        "x2": pc.multiply(x, x)})
        agg = per.group_by("w").aggregate([("x", "sum"), ("x2", "sum")])
        return pa.table({"w": agg["w"], "sx": agg["x_sum"],
                         "sx2": agg["x2_sum"]})

    agg = (ds.select_columns([text_col])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("w")
           .aggregate(Sum("sx", alias_name="sx"),
                      Sum("sx2", alias_name="sx2")))
    topk = agg.sort(["sx", "w"], descending=[True, False]).limit(k)

    def finish(b: pa.Table) -> pa.Table:
        sx = b["sx"].to_numpy(zero_copy_only=False)
        sx2 = b["sx2"].to_numpy(zero_copy_only=False)
        n = n_docs
        # exact-int products converted once, then the same double ops as SQL
        mean = np.array([float(int(v)) / n for v in sx])
        var = np.array([(float(int(b_)) - float(int(a_) * int(a_)) / n)
                        / (n - 1.0) for a_, b_ in zip(sx, sx2)])
        return pa.table({
            "term": b["w"],
            "total": pa.array(sx.astype(np.int64)),
            "mean_cnt": pa.array(np.round(mean, 6), pa.float64()),
            "vmr": pa.array(np.round(var / mean, 6), pa.float64())})

    return topk.map_batches(finish, batch_format="pyarrow")


def hapax_rate_by_group(ds, text_col: str, group_col: str):
    """Hapax-legomena rate per ``group_col``: the fraction of a group's
    unigram VOCABULARY that occurs exactly once in that group. Healthy
    natural text sits near 0.4–0.6 (Zipf tail); a spike flags OCR noise /
    mojibake (garbage tokens are all hapax), a collapse flags templated or
    deduplicated-to-death text. Per-batch (group, word, cnt) partials →
    one groupby-sum → a second tiny groupby over |groups|×|vocab| rows;
    rates are exact-int divisions, identical on both engines."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        grp = pc.fill_null(pc.cast(b[group_col], pa.string()), "")
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(b[text_col], "")), WORD_SPLIT_RE)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        g = pc.take(grp, parents)
        t = pa.table({"g": g, "w": flat}).filter(pc.not_equal(flat, ""))
        agg = t.group_by(["g", "w"]).aggregate([([], "count_all")])
        return pa.table({"g": agg["g"], "w": agg["w"],
                         "cnt": pc.cast(agg["count_all"], pa.int64())})

    cells = (ds.select_columns([group_col, text_col])
             .map_batches(partial, batch_format="pyarrow")
             .groupby(["g", "w"]).aggregate(Sum("cnt", alias_name="cnt")))

    def fold(b: pa.Table) -> pa.Table:
        one = pa.array(np.ones(b.num_rows, np.int64))
        hap = pc.cast(pc.equal(b["cnt"], pa.scalar(1)), pa.int64())
        return pa.table({"g": b["g"], "n_terms": one, "n_hapax": hap})

    agg = (cells.map_batches(fold, batch_format="pyarrow")
           .groupby("g")
           .aggregate(Sum("n_terms", alias_name="n_terms"),
                      Sum("n_hapax", alias_name="n_hapax")))
    return agg.map_batches(
        lambda b: pa.table({
            "source": b["g"],
            "n_terms": pc.cast(b["n_terms"], pa.int64()),
            "n_hapax": pc.cast(b["n_hapax"], pa.int64()),
            "hapax_rate": pc.divide(
                pc.cast(b["n_hapax"], pa.float64()),
                pc.cast(b["n_terms"], pa.float64()))}),
        batch_format="pyarrow")


def zipf_slope_by_group(ds, text_col: str, group_col: str):
    """Zipf rank-frequency slope per ``group_col``: least-squares slope of
    ln(count) on ln(rank) over each group's unigram vocabulary (rank 1 = most
    frequent). Natural text sits near −1; a flatter slope flags templated /
    machine-generated sources, a steeper one flags repetitive boilerplate —
    a one-number corpus-health signal per source.

    Distributed shape: per-batch (group, word, cnt) partials bound the
    exchange at batch-vocabulary × groups; one groupby-sum merges them; a
    per-GROUP map_groups (groups = |sources|, small count / large groups —
    never per-doc) lexsorts its vocabulary once and evaluates the closed-form
    slope (k·Σxy − Σx·Σy)/(k·Σxx − Σx²) — the same formula the SQL oracle
    spells out, 6dp-rounded on both sides to absorb summation-order ulps.
    Tie order within equal counts cannot change the slope (equal y over a
    block of consecutive ranks contributes the same (x, y) multiset)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        grp = pc.fill_null(pc.cast(b[group_col], pa.string()), "")
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(b[text_col], "")), WORD_SPLIT_RE)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        g = pc.take(grp, parents)
        t = pa.table({"g": g, "w": flat}).filter(pc.not_equal(flat, ""))
        agg = t.group_by(["g", "w"]).aggregate([([], "count_all")])
        return pa.table({"g": agg["g"], "w": agg["w"],
                         "cnt": pc.cast(agg["count_all"], pa.int64())})

    cells = (ds.select_columns([group_col, text_col])
             .map_batches(partial, batch_format="pyarrow")
             .groupby(["g", "w"]).aggregate(Sum("cnt", alias_name="cnt")))

    def slope(g: pa.Table) -> pa.Table:
        empty = pa.table({"source": pa.array([], pa.string()),
                          "n_terms": pa.array([], pa.int64()),
                          "zipf_slope": pa.array([], pa.float64())})
        k = g.num_rows
        if k < 2:                       # slope undefined on a 1-word vocab
            return empty
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        w = g["w"].to_numpy(zero_copy_only=False)
        order = np.lexsort((w, -cnt))   # rank by cnt DESC, word ASC
        y = np.log(cnt[order].astype(np.float64))
        x = np.log(np.arange(1, k + 1, dtype=np.float64))
        sx, sy = float(x.sum()), float(y.sum())
        sxy, sxx = float((x * y).sum()), float((x * x).sum())
        denom = k * sxx - sx * sx
        val = np.round((k * sxy - sx * sy) / denom, 6)
        return pa.table({
            "source": pa.array([g["g"][0].as_py()], pa.string()),
            "n_terms": pa.array([k], pa.int64()),
            "zipf_slope": pa.array([val], pa.float64())})

    return cells.groupby("g").map_groups(slope, batch_format="pyarrow")


def bigram_pmi_topk(ds, text_col: str, *, k: int = 50,
                    vocab_max: int = 2_000_000):
    """Collocation extraction: the corpus's top-``k`` bigrams by count
    (ties → (a, b) ascending) with their pointwise mutual information
    ``pmi = ln(c_ab · N_uni / (c_a · c_b))`` — high-count high-PMI pairs
    are multiword expressions ("new york"), high-count LOW-PMI pairs are
    chance collocations of frequent words; both matter for tokenizer and
    phrase-mining decisions.

    Movement: per-batch (a, b, cnt) partials bounded by the batch's
    bigram vocabulary → groupby-sum → DISTRIBUTED sort+limit picks the
    top-k (the bigram table never reaches the driver); unigram counts
    (loud ``vocab_max`` budget) broadcast once and PMI attaches to the
    k winner rows only. Adjacency is over the empty-filtered token
    sequence — identical to the SQL oracle's list_filter + positional
    pairing."""
    import ray
    from ray.data.aggregate import Sum

    from ..stages._collect import collect_up_to

    def bigram_partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(b[text_col], "")), WORD_SPLIT_RE)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        fw = flat.to_numpy(zero_copy_only=False)[keep]
        parents = parents[keep]
        if len(fw) < 2:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        adj = parents[1:] == parents[:-1]
        t = pa.table({"a": pa.array(fw[:-1][adj]),
                      "b": pa.array(fw[1:][adj])})
        agg = t.group_by(["a", "b"]).aggregate([([], "count_all")])
        return pa.table({"a": agg["a"], "b": agg["b"],
                         "cnt": pc.cast(agg["count_all"], pa.int64())})

    top = (ds.select_columns([text_col])
           .map_batches(bigram_partial, batch_format="pyarrow")
           .groupby(["a", "b"]).aggregate(Sum("cnt", alias_name="cnt"))
           .sort(["cnt", "a", "b"], descending=[True, False, False])
           .limit(k))

    uni = (ds.select_columns([text_col]).map_batches(
        lambda b: word_count_partial(b[text_col]), batch_format="pyarrow")
        .groupby("word").aggregate(Sum("cnt", alias_name="cnt")))
    parts, over = collect_up_to(uni, vocab_max)
    if over:
        raise ValueError(f"bigram_pmi_topk: unigram vocabulary exceeds "
                         f"vocab_max={vocab_max}")
    if not parts:
        return top.map_batches(
            lambda b: b.append_column("pmi", pa.nulls(b.num_rows,
                                                      pa.float64())),
            batch_format="pyarrow")
    ut = pa.concat_tables(parts)
    words = ut["word"].to_numpy(zero_copy_only=False)
    cnts = ut["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.argsort(words, kind="stable")
    words, cnts = words[order], cnts[order]
    n_uni = cnts.sum()
    ref = ray.put((words, cnts, n_uni))

    def attach_pmi(b: pa.Table) -> pa.Table:
        import ray as _ray

        w_sorted, wc, n = _ray.get(ref)

        def lookup(col):
            v = col.to_numpy(zero_copy_only=False)
            idx = np.searchsorted(w_sorted, v)
            idx[idx == len(w_sorted)] = 0
            return np.where(w_sorted[idx] == v, wc[idx], np.nan)

        ca, cb = lookup(b["a"]), lookup(b["b"])
        c = b["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
        pmi = np.log(c * n / (ca * cb))
        return b.append_column("pmi", pa.array(pmi, pa.float64()))

    return top.map_batches(attach_pmi, batch_format="pyarrow")


GOPHER_STOPWORDS = ("a", "and", "for", "in", "is", "it", "of", "that",
                    "the", "to")


def gopher_word_filter(ds, text_col: str, id_col: str, *,
                       min_words: int = 15, max_words: int = 500,
                       min_mean_len: float = 2.0, max_mean_len: float = 10.0,
                       min_stopwords: int = 2,
                       stopwords: tuple = GOPHER_STOPWORDS):
    """Gopher-style word-level quality gate (Rae et al. 2021 §A1.1, public
    paper): keep documents whose word count lies in [min_words, max_words],
    whose MEAN word length lies in [min_mean_len, max_mean_len], and that
    contain at least ``min_stopwords`` stop-word tokens — the cheap
    boilerplate/gibberish screen run before any scoring model.

    Map-only and fully vectorized: one regex split per batch, per-row word
    and character totals via bincount over the flattened token array, and
    stop-word membership via one sorted searchsorted probe. No exchange.
    Emits ``(id, n_words, mean_word_len, n_stop)`` for surviving docs."""
    sw = np.sort(np.array(list(stopwords), dtype=object))

    def score(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(b[text_col], "")), WORD_SPLIT_RE)
        tp = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
        flat = pc.list_flatten(toks)
        lens = np.asarray(pc.utf8_length(flat), dtype=np.int64)
        tflat = flat.to_numpy(zero_copy_only=False)
        keep = tflat != ""
        tp, tflat, lens = tp[keep], tflat[keep], lens[keep]
        n = np.bincount(tp, minlength=b.num_rows).astype(np.int64)
        chars = np.bincount(tp, weights=lens.astype(np.float64),
                            minlength=b.num_rows)
        mwl = chars / np.maximum(n, 1).astype(np.float64)
        if len(tflat):
            pos = np.searchsorted(sw, tflat)
            pos[pos == len(sw)] = 0
            is_stop = sw[pos] == tflat
        else:
            is_stop = np.zeros(0, bool)
        n_stop = np.bincount(tp[is_stop], minlength=b.num_rows).astype(
            np.int64)
        mask = ((n >= min_words) & (n <= max_words)
                & (mwl >= min_mean_len) & (mwl <= max_mean_len)
                & (n_stop >= min_stopwords))
        out = pa.table({id_col: b[id_col],
                        "n_words": pa.array(n, pa.int64()),
                        "mean_word_len": pa.array(np.round(mwl, 6),
                                                  pa.float64()),
                        "n_stop": pa.array(n_stop, pa.int64())})
        return out.filter(pa.array(mask))

    return ds.map_batches(score, batch_format="pyarrow")


LETTER_RE = r"[A-Za-z]"
NONSPACE_RE = r"\S+"
SENTENCE_RE = r"[.!?]+"


def readability_by_group(ds, text_col: str, group_col: str):
    """Coleman–Liau readability of each group's pooled text: per-source
    int64 sufficient statistics (letters, non-space words, sentence-ending
    punctuation runs — all RE2 ``count_substring_regex`` counts, so the SQL
    oracle's ``len(regexp_extract_all(...))`` counts the same leftmost
    non-overlapping matches) and the CLI index computed ONCE per group from
    the aggregate ratios (L = letters-per-100-words, S =
    sentences-per-100-words; CLI = 0.0588·L − 0.296·S − 15.8). Integer sums
    are exact and order-independent; the finish is three float ops mirrored
    verbatim in the oracle. Map-only partials, one |groups|-row exchange."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        s = pc.fill_null(b[text_col], "")
        t = pa.table({
            "g": pc.fill_null(pc.cast(b[group_col], pa.string()), ""),
            "_d": pa.array(np.ones(b.num_rows, np.int64)),
            "_l": pc.cast(pc.count_substring_regex(s, LETTER_RE), pa.int64()),
            "_w": pc.cast(pc.count_substring_regex(s, NONSPACE_RE),
                          pa.int64()),
            "_s": pc.cast(pc.count_substring_regex(s, SENTENCE_RE),
                          pa.int64())})
        agg = t.group_by("g").aggregate(
            [("_d", "sum"), ("_l", "sum"), ("_w", "sum"), ("_s", "sum")])
        return pa.table({"g": agg["g"], "d": agg["_d_sum"],
                         "l": agg["_l_sum"], "w": agg["_w_sum"],
                         "s": agg["_s_sum"]})

    agg = (ds.select_columns([group_col, text_col])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("g")
           .aggregate(Sum("d", alias_name="n_docs"),
                      Sum("l", alias_name="letters"),
                      Sum("w", alias_name="words"),
                      Sum("s", alias_name="sentences")))

    def finish(b: pa.Table) -> pa.Table:
        let = b["letters"].to_numpy(zero_copy_only=False).astype(np.float64)
        w = b["words"].to_numpy(zero_copy_only=False).astype(np.float64)
        sent = (b["sentences"].to_numpy(zero_copy_only=False)
                .astype(np.float64))
        with np.errstate(divide="ignore", invalid="ignore"):
            lper = let / w * 100.0
            sper = sent / w * 100.0
            cli = np.round(0.0588 * lper - 0.296 * sper - 15.8, 6)
        return pa.table({
            "source": b["g"],
            "n_docs": pc.cast(b["n_docs"], pa.int64()),
            "letters": pc.cast(b["letters"], pa.int64()),
            "words": pc.cast(b["words"], pa.int64()),
            "sentences": pc.cast(b["sentences"], pa.int64()),
            "cli": pa.array(cli, pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def pii_census_by_group(ds, text_col: str, group_col: str):
    """PII exposure census per group: how many docs contain ≥1 email / ≥1
    phone match and the total match counts — the "should this source go
    through the redaction stage at all" routing signal in front of
    ``redact_pii`` (which pays the rewrite). Both counts run on the RAW
    text with the same RE2 patterns the redactor uses, so the census is an
    exact preview of what redaction would touch. Int64 sums only — exact,
    order-independent; map-only partials, one |groups|-row exchange."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        s = pc.fill_null(b[text_col], "")
        ne = pc.cast(pc.count_substring_regex(s, EMAIL_RE), pa.int64())
        np_ = pc.cast(pc.count_substring_regex(s, PHONE_RE), pa.int64())
        t = pa.table({
            "g": pc.fill_null(pc.cast(b[group_col], pa.string()), ""),
            "_d": pa.array(np.ones(b.num_rows, np.int64)),
            "_de": pc.cast(pc.greater(ne, pa.scalar(0)), pa.int64()),
            "_dp": pc.cast(pc.greater(np_, pa.scalar(0)), pa.int64()),
            "_ne": ne, "_np": np_})
        agg = t.group_by("g").aggregate(
            [("_d", "sum"), ("_de", "sum"), ("_dp", "sum"),
             ("_ne", "sum"), ("_np", "sum")])
        return pa.table({"g": agg["g"], "d": agg["_d_sum"],
                         "de": agg["_de_sum"], "dp": agg["_dp_sum"],
                         "ne": agg["_ne_sum"], "np": agg["_np_sum"]})

    agg = (ds.select_columns([group_col, text_col])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("g")
           .aggregate(Sum("d", alias_name="n_docs"),
                      Sum("de", alias_name="docs_with_email"),
                      Sum("dp", alias_name="docs_with_phone"),
                      Sum("ne", alias_name="n_emails"),
                      Sum("np", alias_name="n_phones")))
    return agg.map_batches(
        lambda b: pa.table({
            "source": b["g"],
            "n_docs": pc.cast(b["n_docs"], pa.int64()),
            "docs_with_email": pc.cast(b["docs_with_email"], pa.int64()),
            "docs_with_phone": pc.cast(b["docs_with_phone"], pa.int64()),
            "n_emails": pc.cast(b["n_emails"], pa.int64()),
            "n_phones": pc.cast(b["n_phones"], pa.int64())}),
        batch_format="pyarrow")


def c4_census_by_group(ds, text_col: str, group_col: str):
    """C4-style heuristic-filter census per group (Raffel et al. 2020
    shapes): per-doc pass/fail against word-count bounds [50, 10000],
    ">=3 sentence marks", "no curly braces" and "no 'lorem ipsum'",
    aggregated to per-source drop counts so the routing decision ("does
    this source survive a C4 pass at all") costs one map-only scan —
    not a doc-level rewrite. Every predicate is an RE2
    ``count_substring_regex`` / ``match_substring`` the SQL oracle
    reproduces verbatim. Map-only partials, one |groups|-row exchange."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        s = pc.fill_null(b[text_col], "")
        w = pc.cast(pc.count_substring_regex(s, NONSPACE_RE), pa.int64())
        sent = pc.cast(pc.count_substring_regex(s, SENTENCE_RE), pa.int64())
        short = pc.less(w, pa.scalar(50, pa.int64()))
        long_ = pc.greater(w, pa.scalar(10_000, pa.int64()))
        few = pc.less(sent, pa.scalar(3, pa.int64()))
        brace = pc.match_substring_regex(s, r"[{}]")
        lorem = pc.match_substring_regex(pc.utf8_lower(s), r"lorem ipsum")
        bad = pc.or_(pc.or_(pc.or_(short, long_), few),
                     pc.or_(brace, lorem))
        t = pa.table({
            "g": pc.fill_null(pc.cast(b[group_col], pa.string()), ""),
            "_d": pa.array(np.ones(b.num_rows, np.int64)),
            "_s": pc.cast(short, pa.int64()),
            "_l": pc.cast(long_, pa.int64()),
            "_f": pc.cast(few, pa.int64()),
            "_b": pc.cast(brace, pa.int64()),
            "_o": pc.cast(lorem, pa.int64()),
            "_k": pc.cast(pc.invert(bad), pa.int64())})
        agg = t.group_by("g").aggregate(
            [("_d", "sum"), ("_s", "sum"), ("_l", "sum"), ("_f", "sum"),
             ("_b", "sum"), ("_o", "sum"), ("_k", "sum")])
        return pa.table({"g": agg["g"], "d": agg["_d_sum"],
                         "s": agg["_s_sum"], "l": agg["_l_sum"],
                         "f": agg["_f_sum"], "b": agg["_b_sum"],
                         "o": agg["_o_sum"], "k": agg["_k_sum"]})

    agg = (ds.select_columns([group_col, text_col])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("g")
           .aggregate(Sum("d", alias_name="n_docs"),
                      Sum("s", alias_name="n_short"),
                      Sum("l", alias_name="n_long"),
                      Sum("f", alias_name="n_few_sentences"),
                      Sum("b", alias_name="n_braces"),
                      Sum("o", alias_name="n_lorem"),
                      Sum("k", alias_name="n_kept")))
    return agg.map_batches(
        lambda b: pa.table({
            "source": b["g"],
            "n_docs": pc.cast(b["n_docs"], pa.int64()),
            "n_short": pc.cast(b["n_short"], pa.int64()),
            "n_long": pc.cast(b["n_long"], pa.int64()),
            "n_few_sentences": pc.cast(b["n_few_sentences"], pa.int64()),
            "n_braces": pc.cast(b["n_braces"], pa.int64()),
            "n_lorem": pc.cast(b["n_lorem"], pa.int64()),
            "n_kept": pc.cast(b["n_kept"], pa.int64())}),
        batch_format="pyarrow")


def charset_census_by_group(ds, text_col: str, group_col: str):
    """Character-class census per group: non-ASCII exposure (docs and
    total chars), U+FFFD replacement-char docs (mojibake signal), plus
    uppercase / digit / whitespace char totals — the encoding-health
    profile a crawl source is admitted on. All counts are RE2 char-class
    ``count_substring_regex`` totals (int64, order-independent) that the
    SQL oracle reproduces with ``len(regexp_extract_all(...))``.
    Map-only partials, one |groups|-row exchange."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        s = pc.fill_null(b[text_col], "")
        nonascii = pc.cast(pc.count_substring_regex(s, r"[^\x00-\x7F]"),
                           pa.int64())
        t = pa.table({
            "g": pc.fill_null(pc.cast(b[group_col], pa.string()), ""),
            "_d": pa.array(np.ones(b.num_rows, np.int64)),
            "_nad": pc.cast(pc.greater(nonascii, 0), pa.int64()),
            "_nac": nonascii,
            "_rep": pc.cast(pc.match_substring(s, "�"), pa.int64()),
            "_up": pc.cast(pc.count_substring_regex(s, r"[A-Z]"), pa.int64()),
            "_dg": pc.cast(pc.count_substring_regex(s, r"[0-9]"), pa.int64()),
            "_ws": pc.cast(pc.count_substring_regex(s, r"\s"), pa.int64())})
        agg = t.group_by("g").aggregate(
            [("_d", "sum"), ("_nad", "sum"), ("_nac", "sum"),
             ("_rep", "sum"), ("_up", "sum"), ("_dg", "sum"), ("_ws", "sum")])
        return pa.table({"g": agg["g"], "d": agg["_d_sum"],
                         "nad": agg["_nad_sum"], "nac": agg["_nac_sum"],
                         "rep": agg["_rep_sum"], "up": agg["_up_sum"],
                         "dg": agg["_dg_sum"], "ws": agg["_ws_sum"]})

    agg = (ds.select_columns([group_col, text_col])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("g")
           .aggregate(Sum("d", alias_name="n_docs"),
                      Sum("nad", alias_name="docs_nonascii"),
                      Sum("nac", alias_name="chars_nonascii"),
                      Sum("rep", alias_name="docs_replacement"),
                      Sum("up", alias_name="chars_upper"),
                      Sum("dg", alias_name="chars_digit"),
                      Sum("ws", alias_name="chars_space")))
    return agg.map_batches(
        lambda b: pa.table({
            "source": b["g"],
            "n_docs": pc.cast(b["n_docs"], pa.int64()),
            "docs_nonascii": pc.cast(b["docs_nonascii"], pa.int64()),
            "chars_nonascii": pc.cast(b["chars_nonascii"], pa.int64()),
            "docs_replacement": pc.cast(b["docs_replacement"], pa.int64()),
            "chars_upper": pc.cast(b["chars_upper"], pa.int64()),
            "chars_digit": pc.cast(b["chars_digit"], pa.int64()),
            "chars_space": pc.cast(b["chars_space"], pa.int64())}),
        batch_format="pyarrow")


def doc_ttr(ds, text_col: str, id_col: str):
    """Per-doc type-token ratio (distinct lowercased ``\\S+`` tokens /
    tokens) — the lexical-diversity quality signal (low TTR = templated /
    repetitive text). Vectorized per batch: one flat token explode, one
    ``np.unique`` factorize, doc×vocab pair codes deduped with a second
    ``np.unique`` and counted per doc with ``np.bincount`` — no per-doc
    Python loop, no exchange at all (doc-local metric, map-only)."""

    def per_batch(b: pa.Table) -> pa.Table:
        s = pc.utf8_lower(pc.fill_null(b[text_col], ""))
        # Arrow has no per-row findall; split on whitespace runs and drop
        # empties — identical token set to the \S+ oracle.
        parts = pc.split_pattern_regex(s, r"\s+")
        flat = pc.list_flatten(parts)
        lens = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        words = flat.to_numpy(zero_copy_only=False)
        keep = words != ""
        words = words[keep]
        doc_idx = doc_idx[keep]
        n = b.num_rows
        n_tokens = np.bincount(doc_idx, minlength=n).astype(np.int64)
        if len(words):
            _, codes = np.unique(words, return_inverse=True)
            pair = doc_idx * np.int64(len(_)) + codes
            uniq = np.unique(pair)
            n_types = np.bincount(uniq // np.int64(len(_)),
                                  minlength=n).astype(np.int64)
        else:
            n_types = np.zeros(n, np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            ttr = np.round(n_types / n_tokens, 6)
        return pa.table({
            id_col: b[id_col],
            "n_tokens": pa.array(n_tokens),
            "n_types": pa.array(n_types),
            "ttr": pa.array(ttr, pa.float64(), from_pandas=True)})

    return ds.select_columns([id_col, text_col]).map_batches(
        per_batch, batch_format="pyarrow")


def vocab_jaccard_by_group(ds, text_col: str, group_col: str):
    """Pairwise Jaccard similarity between the unigram VOCABULARIES of
    each pair of groups (sources) — the corpus-level "are these two feeds
    the same kind of text" signal (near 1: mirrored scrapes; near 0:
    different domains/languages). Tokenization = the shared WORD_SPLIT_RE
    convention. Returns (source_a, source_b, n_a, n_b, n_shared, jaccard
    6dp) for unordered pairs with n_shared > 0, names sorted a < b;
    ratios divide exact int64 counts.

    Distributed shape: per-batch DISTINCT (group, word) partials → one
    groupby-sum dedupe → a 64-way WORD-shard exchange where each shard
    folds its words into per-group-set BITMASK counts (vectorized scatter
    over factorized words; |groups| ≤ 63 enforced) → the ≤ shards × 2^|G|
    mask census folds on the driver into all pairwise intersections and
    per-group sizes. No word self-join, no pair explosion."""
    from ray.data.aggregate import Count, Sum

    from ..stages.asof import _shard_of

    def cells(b: pa.Table) -> pa.Table:
        grp = pc.fill_null(pc.cast(b[group_col], pa.string()), "")
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(b[text_col], "")), WORD_SPLIT_RE)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        g = pc.take(grp, parents)
        t = pa.table({"g": g, "w": flat}).filter(pc.not_equal(flat, ""))
        return (t.group_by(["g", "w"]).aggregate([([], "count_all")])
                .select(["g", "w"]))

    pairs = (ds.select_columns([group_col, text_col])
             .map_batches(cells, batch_format="pyarrow")
             .groupby(["g", "w"]).aggregate(Count(alias_name="_c")))

    # tiny group census -> fixed bit positions, broadcast by value
    gparts = (pairs.map_batches(
        lambda b: pa.table({"g": pc.unique(b["g"].combine_chunks())}),
        batch_format="pyarrow")
        .groupby("g").aggregate(Count(alias_name="_c")).to_pandas())
    groups = sorted(gparts["g"].tolist())
    if len(groups) > 63:
        raise ValueError("vocab_jaccard_by_group: more than 63 groups — "
                         "bitmask folding needs a wider type")
    bit_of = {g: 1 << i for i, g in enumerate(groups)}

    def shard_tag(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_shard", pa.array(_shard_of(b["w"], 64)))

    def masks(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"mask": pa.array([], pa.int64()),
                             "n_words": pa.array([], pa.int64())})
        codes, _ = __import__("pandas").factorize(
            g["w"].to_numpy(zero_copy_only=False))
        bits = np.array([bit_of[x] for x in g["g"].to_pylist()],
                        dtype=np.int64)
        m = np.zeros(codes.max() + 1, dtype=np.int64)
        np.bitwise_or.at(m, codes, bits)
        mk, cnt = np.unique(m, return_counts=True)
        return pa.table({"mask": pa.array(mk),
                         "n_words": pa.array(cnt.astype(np.int64))})

    census = (pairs.map_batches(shard_tag, batch_format="pyarrow")
              .groupby("_shard").map_groups(masks, batch_format="pyarrow")
              .groupby("mask").aggregate(Sum("n_words",
                                             alias_name="n_words"))
              .to_pandas())
    mk = census["mask"].to_numpy(np.int64)
    nw = census["n_words"].to_numpy(np.int64)
    size = {g: int(nw[(mk & bit_of[g]) != 0].sum()) for g in groups}
    rows = []
    for i, a in enumerate(groups):
        for b_ in groups[i + 1:]:
            both = bit_of[a] | bit_of[b_]
            shared = int(nw[(mk & both) == both].sum())
            if shared == 0:
                continue
            na, nb = size[a], size[b_]
            rows.append((a, b_, na, nb, shared,
                         float(np.round(float(shared)
                                        / float(na + nb - shared), 6))))
    import pandas as pd
    return pd.DataFrame(rows, columns=["source_a", "source_b", "n_a",
                                       "n_b", "n_shared", "jaccard"])
