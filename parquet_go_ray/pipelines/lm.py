"""Corpus-level language-model quality scoring.

CCNet-style (Wenzek et al. 2020, public) filtering ranks documents by
LM negative log-likelihood; at corpus scale the standard cheap stand-in
is a unigram LM trained on the corpus itself. `unigram_logprob_scores`
computes, for every document, the mean negative log-probability of its
whitespace tokens under the corpus unigram distribution — one number
per doc, low = fluent/common, high = rare/garbled, the classic
perplexity-filter axis.

Scale shape (100 TB): nothing token-sized ever reaches the driver.
- pass 1: one streaming aggregate for the global token total N
  (per-batch int partials -> sum; a scalar).
- pass 2: per-batch (token-hash, doc_id, count) partials — Zipf
  collapses repeated tokens per doc, so this is far smaller than the
  token stream — hash-partitioned by token hash. Every occurrence of a
  token lands in one partition, so the GLOBAL count of each token is a
  partition-local sum; each partition then scores its share of every
  doc (count * -ln(global_cnt / N)) and emits fixed-width (doc_id,
  partial_sum, partial_cnt) rows.
- pass 3: sum partials by doc hash-partition and divide.
Two id/scalar-only exchanges, both O(distinct (doc, token) pairs) at
24-32 B/row; text is read, tokenized and dropped inside the batch.

Token identity is XXH64 of the token bytes, so the SQL oracle (which
groups by the token STRING) agrees exactly on single-space corpora;
a collision would need ~2^32 distinct tokens (see hashing.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions import hashing


def _doc_token_hash_counts(
    texts: list[bytes],
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-(doc, token) occurrence counts for one batch: returns
    (local doc index, token hash uint64, count) with one row per
    DISTINCT token per doc. Fully vectorized (tokenize -> XXH64 ->
    lexsort -> run-length)."""
    from ..codecs.sbbf import xxhash64

    comp, tok_offsets, doc_tok_starts = hashing._tokenize_bytes(texts)
    n_tokens = len(tok_offsets) - 1
    if n_tokens == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, np.zeros(0, dtype=np.uint64), z
    h = xxhash64(comp.tobytes(), tok_offsets)
    didx = np.searchsorted(
        doc_tok_starts[1:], np.arange(n_tokens, dtype=np.int64), side="right"
    )
    order = np.lexsort((h, didx))
    ds_, hs_ = didx[order], h[order]
    new = np.ones(n_tokens, dtype=bool)
    new[1:] = (ds_[1:] != ds_[:-1]) | (hs_[1:] != hs_[:-1])
    starts = np.flatnonzero(new)
    cnt = np.diff(np.append(starts, n_tokens)).astype(np.int64)
    return ds_[starts], hs_[starts], cnt


def unigram_logprob_scores(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_partitions: int = 64,
) -> ray.data.Dataset:
    """Mean unigram negative log-likelihood per document, in 1e-4 nat
    units (BIGINT `nll_e4` — integer output keeps the result
    hash-stable across float summation orders). Docs with zero tokens
    are dropped (they have no distribution to score)."""
    P = n_partitions

    # pass 1: global token count N (scalar aggregate, never a
    # materialization; costs one extra streaming read of text — at
    # scale the token-hash exchange below dominates, and folding N in
    # would force materializing the partials mid-pipeline instead)
    def count_tokens(batch: pa.Table) -> pd.DataFrame:
        texts = [t.encode() for t in batch.column(text_col).to_pylist()]
        _, tok_offsets, _ = hashing._tokenize_bytes(texts)
        return pd.DataFrame({"n": np.array([len(tok_offsets) - 1], np.int64)})

    total = ds.map_batches(count_tokens, batch_format="pyarrow").sum("n")
    if not total:
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    id_col: np.zeros(0, np.int64),
                    "nll_e4": np.zeros(0, np.int64),
                }
            )
        )
    log_n = float(np.log(total))

    def partials(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        texts = [t.encode() for t in batch.column(text_col).to_pylist()]
        didx, h, cnt = _doc_token_hash_counts(texts)
        return pd.DataFrame(
            {
                "h": h.view(np.int64),
                id_col: ids[didx],
                "c": cnt,
                "pt": (h % np.uint64(P)).astype(np.int64),
            }
        )

    def score_partition(part: pd.DataFrame) -> pd.DataFrame:
        # all occurrences of a token hash are in this partition, so its
        # global count is a local sum
        g = part.groupby("h", sort=False)["c"].transform("sum").to_numpy()
        nl = log_n - np.log(g.astype(np.float64))
        contrib = part["c"].to_numpy() * nl
        agg = pd.DataFrame(
            {id_col: part[id_col].to_numpy(), "s": contrib, "c": part["c"]}
        ).groupby(id_col, sort=False, as_index=False)[["s", "c"]].sum()
        ids = agg[id_col].to_numpy().astype(np.int64)
        agg["pt"] = ids % P
        return agg

    def finish(part: pd.DataFrame) -> pd.DataFrame:
        agg = part.groupby(id_col, sort=False, as_index=False)[["s", "c"]].sum()
        score = agg["s"].to_numpy() / agg["c"].to_numpy()
        return pd.DataFrame(
            {
                id_col: agg[id_col].to_numpy().astype(np.int64),
                "nll_e4": np.floor(score * 1e4 + 0.5).astype(np.int64),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("pt")
        .map_groups(score_partition, batch_format="pandas")
        .groupby("pt")
        .map_groups(finish, batch_format="pandas")
    )


def dsir_weights(
    ds: ray.data.Dataset,
    target_col: str = "source",
    target_value: str = "src0",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_partitions: int = 64,
) -> ray.data.Dataset:
    """DSIR-style importance weights (Xie et al. 2023, public): score
    every document by how target-domain-like its hashed-unigram
    distribution is. Per doc, the mean log importance ratio

        logw(d) = avg_t [ ln(ct(t)+1) - ln(cs(t)+1) ] + K,
        K = ln(Ns+1) - ln(Nt+1)

    where ct/cs are the token's occurrence counts in the TARGET slice
    (rows with target_col == target_value) and the WHOLE corpus, and
    Nt/Ns the corresponding token totals — add-one smoothing with the
    normalizing constants factored out of the per-token sum, so the
    per-doc part rides the SAME single token-hash exchange as
    unigram_logprob_scores (two id-sized shuffles total, text never
    leaves the tokenizing batch). Output (id_col, logw_e4) in 1e-4 nat
    units; high = target-like, the DSIR resampling key. Zero-token
    docs are dropped.

    Scale shape (100 TB): identical to unigram_logprob_scores — one
    extra int64 column (target count) on the partial rows is the whole
    marginal cost of the second distribution.
    """
    from ray.data.aggregate import Sum

    P = n_partitions

    def count_tokens(batch: pa.Table) -> pd.DataFrame:
        texts = [t.encode() for t in batch.column(text_col).to_pylist()]
        is_t = np.array(
            [v == target_value for v in batch.column(target_col).to_pylist()]
        )
        _, tok_offsets, doc_tok_starts = hashing._tokenize_bytes(texts)
        per_doc = np.diff(doc_tok_starts).astype(np.int64)
        ns = int(len(tok_offsets) - 1)
        nt = int(per_doc[is_t].sum()) if len(per_doc) else 0
        return pd.DataFrame(
            {"ns": np.array([ns], np.int64), "nt": np.array([nt], np.int64)}
        )

    totals = ds.map_batches(count_tokens, batch_format="pyarrow").aggregate(
        Sum("ns"), Sum("nt")
    )
    ns_total = int(totals.get("sum(ns)") or 0)
    nt_total = int(totals.get("sum(nt)") or 0)
    if ns_total == 0:
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    id_col: np.zeros(0, np.int64),
                    "logw_e4": np.zeros(0, np.int64),
                }
            )
        )
    k_const = float(np.log(ns_total + 1.0) - np.log(nt_total + 1.0))

    def partials(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        texts = [t.encode() for t in batch.column(text_col).to_pylist()]
        is_t = np.array(
            [v == target_value for v in batch.column(target_col).to_pylist()],
            dtype=bool,
        )
        didx, h, cnt = _doc_token_hash_counts(texts)
        if len(didx):
            tc = np.where(is_t[didx], cnt, 0).astype(np.int64)
        else:
            tc = cnt
        return pd.DataFrame(
            {
                "h": h.view(np.int64),
                id_col: ids[didx],
                "c": cnt,
                "tc": tc,
                "pt": (h % np.uint64(P)).astype(np.int64),
            }
        )

    def score_partition(part: pd.DataFrame) -> pd.DataFrame:
        # every occurrence of a token hash is in this partition: both
        # global counts are local sums
        g = part.groupby("h", sort=False)[["c", "tc"]].transform("sum")
        cs = g["c"].to_numpy().astype(np.float64)
        ct = g["tc"].to_numpy().astype(np.float64)
        nl = np.log(ct + 1.0) - np.log(cs + 1.0)
        contrib = part["c"].to_numpy() * nl
        agg = pd.DataFrame(
            {id_col: part[id_col].to_numpy(), "s": contrib, "c": part["c"]}
        ).groupby(id_col, sort=False, as_index=False)[["s", "c"]].sum()
        ids = agg[id_col].to_numpy().astype(np.int64)
        agg["pt"] = ids % P
        return agg

    def finish(part: pd.DataFrame) -> pd.DataFrame:
        agg = part.groupby(id_col, sort=False, as_index=False)[["s", "c"]].sum()
        score = agg["s"].to_numpy() / agg["c"].to_numpy() + k_const
        return pd.DataFrame(
            {
                id_col: agg[id_col].to_numpy().astype(np.int64),
                "logw_e4": np.floor(score * 1e4 + 0.5).astype(np.int64),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("pt")
        .map_groups(score_partition, batch_format="pandas")
        .groupby("pt")
        .map_groups(finish, batch_format="pandas")
    )


def pack_sequences(
    ds,
    max_tokens: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_docs: int = 4096,
    id_span_hint: int | None = None,
) -> "ray.data.Dataset":
    """Pack variable-length documents into fixed-capacity training
    sequences (the final prep step before pretraining: concatenate docs
    until the context window is full, start a new sequence when the
    next doc would overflow). Returns one row per doc:
    (doc_id, n_tokens, seq_id, seq_fill) where seq_fill is the packed
    token total of the doc's sequence (<= max_tokens unless a single
    doc alone exceeds the cap, which gets its own overflow sequence).

    Determinism + scale shape: docs are bucketed by CONTIGUOUS id range
    (id // bucket_docs — no sampling, no layout dependence), so the
    packing is a pure function of (ids, lengths) regardless of block
    layout or cluster size, and each bucket packs independently in one
    task. Within a bucket: big+smalls folding — each sequence opens
    with the largest unpacked doc and fills the remainder with as many
    of the SMALLEST unpacked docs as fit (one searchsorted on the
    ascending length cumsum per SEQUENCE, so the per-task loop count is
    O(sequences), not O(docs); measured ~91% fill on uniform 20-900
    token docs at cap 2048 vs ~84% for plain run-splitting — the gap to
    true first-fit-decreasing is mid-sized-doc pairings, the price of
    staying two-pointer/vectorized). Token
    counts are whitespace-run counts (swap in a real tokenizer upstream
    by providing an n_tokens column: if the input already has one, it
    is used as-is).

    Global seq_id = bucket * 2^24 + seq-within-bucket (collision-free
    while a bucket packs < 16.7M sequences; bucket_docs bounds it)."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as _pc

    import ray.data  # noqa: F401

    have_counts = "n_tokens" in ds.schema().names

    def add_meta(t):
        import pyarrow as pa

        ids = t.column(id_col)
        if have_counts:
            n_tok = t.column("n_tokens")
        else:
            n_tok = _pc.count_substring_regex(
                _pc.cast(t.column(text_col), pa.large_string()), r"\S+"
            )
            n_tok = _pc.cast(n_tok, pa.int64())
        bucket = _pc.divide(_pc.cast(ids, pa.int64()), bucket_docs)
        return pa.table(
            {
                id_col: _pc.cast(ids, pa.int64()),
                "n_tokens": n_tok,
                "bucket": bucket,
            }
        )

    def pack(part: pd.DataFrame) -> pd.DataFrame:
        bucket = int(part["bucket"].iloc[0])
        ids = part[id_col].to_numpy().astype(np.int64)
        toks = part["n_tokens"].to_numpy().astype(np.int64)
        order = np.lexsort((ids, toks))  # length ASC, id tiebreak
        ids, toks = ids[order], toks[order]
        csum = np.concatenate(([0], np.cumsum(toks)))
        seq_of = np.zeros(len(ids), dtype=np.int64)
        lo, hi, seq = 0, len(ids) - 1, 0
        while lo <= hi:
            # open with the largest unpacked doc...
            seq_of[hi] = seq
            rem = max(max_tokens - int(toks[hi]), 0)
            hi -= 1
            # ...and fold in as many of the smallest unpacked docs as
            # fit: largest k with sum(toks[lo:k]) <= rem
            k = int(np.searchsorted(csum, csum[lo] + rem, side="right")) - 1
            k = min(k, hi + 1)
            if k > lo:
                seq_of[lo:k] = seq
                lo = k
            seq += 1
        fills = np.bincount(seq_of, weights=toks).astype(np.int64)
        return pd.DataFrame(
            {
                id_col: ids,
                "n_tokens": toks,
                "seq_id": (bucket << 24) + seq_of,
                "seq_fill": fills[seq_of],
            }
        )

    return (
        ds.map_batches(add_meta, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pack, batch_format="pandas")
    )


def mix_corpora(
    ds,
    rates: dict[str, float],
    default_rate: float = 1.0,
    id_col: str = "doc_id",
    source_col: str = "source",
    seed: int = 29,
) -> "ray.data.Dataset":
    """Weighted domain mixing: re-weight a multi-source corpus to target
    per-source sampling rates (the DoReMi / Pile-weights step that turns
    a raw crawl into a training mixture). A rate r means each doc of
    that source appears floor(r) times for sure plus once more with
    probability frac(r) — so r=0.25 downsamples 4x, r=2.5 emits 2 or 3
    epochs per doc. Returns one row per EMITTED copy:
    (id_col, source_col, epoch) with epoch in [0, ceil(r)).

    Determinism + scale shape: the fractional draw is the knuth32 mix
    of (id + seed) — a pure function of the id, so the mixture is
    rerun-, resume-, layout- and cluster-size-invariant (rows only ever
    ADD when a rate grows, never migrate; same commitment as
    dataset_split), and the whole operator is map-only with zero
    shuffle: each batch expands independently via np.repeat. The oracle
    states the identical function in portable SQL (CROSS JOIN a small
    epoch series + the same hash threshold)."""

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy().astype(np.int64)
        src = df[source_col].astype(str)
        rate = src.map(lambda s: float(rates.get(s, default_rate))).to_numpy(
            np.float64
        )
        full = np.floor(rate).astype(np.int64)
        mix = ((ids + seed) * np.int64(2654435761)) % np.int64(1 << 32)
        u = mix.astype(np.float64) / np.float64(1 << 32)
        copies = full + (u < (rate - full)).astype(np.int64)
        idx = np.repeat(np.arange(len(ids), dtype=np.int64), copies)
        starts = np.concatenate(([0], np.cumsum(copies)))[:-1]
        epoch = (
            np.arange(int(copies.sum()), dtype=np.int64)
            - np.repeat(starts, copies)
        )
        return pd.DataFrame(
            {
                id_col: ids[idx],
                source_col: src.to_numpy(dtype=object)[idx],
                "epoch": epoch,
            }
        )

    return ds.select_columns([id_col, source_col]).map_batches(
        expand, batch_format="pandas"
    )


def perplexity_filter(
    ds: "ray.data.Dataset",
    keep_frac: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """CCNet-style perplexity filtering: score every doc with the
    corpus-unigram mean NLL (`unigram_logprob_scores`, integer 1e-4
    nats) and keep the most-fluent `keep_frac` of the corpus — docs
    with nll_e4 <= T, where T is the SMALLEST score value whose
    cumulative doc count reaches ceil(keep_frac * n). Thresholding on
    the VALUE (not the rank) keeps every tied doc at the boundary, so
    the output is a pure function of the corpus — no tie-break
    ambiguity, rerun/layout/cluster-size invariant, and the oracle can
    state the identical rule as a window cumsum.

    Scale shape: the score table (one 16 B row per doc) is checkpointed
    once — it has two consumers (threshold + filter) and re-deriving it
    would re-run the token exchange twice. The threshold comes from a
    DISTINCT-VALUE histogram (scores are bounded integers: ~0..2e5
    distinct values regardless of corpus size), folded in one tiny
    groupby; the filter is then map-only against the broadcast scalar.
    Returns (doc_id, nll_e4) for the kept docs."""
    scores = unigram_logprob_scores(
        ds, text_col=text_col, id_col=id_col
    ).materialize()  # two consumers; 16 B/doc — the curate-chain seam
    n = scores.count()
    if n == 0:
        return scores
    need = int(np.ceil(keep_frac * n))

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("nll_e4", sort=False).size()
        return pd.DataFrame(
            {"nll_e4": g.index.to_numpy(np.int64), "cnt": g.to_numpy(np.int64)}
        )

    h = (
        scores.map_batches(hist, batch_format="pandas")
        .groupby("nll_e4")
        .sum("cnt")
        .to_pandas()
        .sort_values("nll_e4")
    )
    cum = h["sum(cnt)"].cumsum().to_numpy()
    thr = int(h["nll_e4"].to_numpy()[np.searchsorted(cum, need)])

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["nll_e4"] <= thr]

    return scores.map_batches(keep, batch_format="pandas")


# --------------------------------------------------------------- BPE


def word_frequencies(ds, text_col: str = "text", partitions: int = 64):
    """Distributed word-frequency table: per-batch value_counts partials
    (bounded by per-batch vocab), hash-partitioned vectorized merge —
    counts, never word instances, ride the exchange (the vocab_topk
    shape). Returns a pandas DataFrame (word, n), n descending, word
    ascending on ties. The result is VOCAB-sized, not corpus-sized —
    the property that makes driver-side BPE training below
    scale-correct."""
    import pandas as pd

    from ..functions.hashing import stable_hash_strings

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].str.split(" ").explode()
        toks = toks[toks != ""]
        vc = toks.value_counts()
        return pd.DataFrame(
            {"word": vc.index.astype(str), "n": vc.to_numpy().astype(np.int64)}
        )

    def add_pt(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["pt"] = (
            stable_hash_strings(df["word"].to_numpy()) % np.uint64(partitions)
        ).astype(np.int64)
        return df

    def merge(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("word", sort=False, as_index=False)["n"].sum()
        g["n"] = g["n"].astype(np.int64)
        return g

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_pt, batch_format="pandas")
        .groupby("pt")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["n", "word"], ascending=[False, True], ignore_index=True)


def train_bpe(word_freq, n_merges: int = 64) -> list[tuple[str, str]]:
    """Classic BPE merge training (Sennrich et al. 2016) over a
    word-frequency table: symbols start as characters + a </w> end
    marker, each round merges the most frequent adjacent pair (count
    desc, pair lexicographic on ties — fully deterministic). Runs on
    the driver because its input is the VOCAB-sized frequency table
    from word_frequencies(), never the corpus; the corpus-sized work
    (counting) is distributed, the state-sized work (merging) is not —
    the same split every production tokenizer trainer makes."""
    vocab: dict[tuple, int] = {}
    for w, n in zip(word_freq["word"], word_freq["n"]):
        vocab[tuple(w) + ("</w>",)] = vocab.get(tuple(w) + ("</w>",), 0) + int(n)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple, int] = {}
        for sym, n in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        # deterministic: count desc, then lexicographically SMALLEST pair
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple, int] = {}
        for sym, n in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + n
        vocab = new_vocab
    return merges


def _bpe_encode_word(word: str, ranks: dict) -> list[str]:
    sym = list(word) + ["</w>"]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


class BPEApplier:
    """Stateful actor-pool apply stage: the merge ranks load ONCE per
    actor in __init__ (from the object store), and a per-actor memo
    caches each UNIQUE word's encoding across every batch the actor
    sees — per-batch work is np.unique + memo lookups, the per-word
    merge loop runs once per distinct word per actor."""

    def __init__(self, merges_ref):
        import ray as _ray

        merges = _ray.get(merges_ref)
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.memo: dict[str, int] = {}

    def __call__(self, df):
        import pandas as pd

        counts = []
        for text in df["text"]:
            words = [w for w in text.split(" ") if w]
            total = 0
            for w in words:
                n = self.memo.get(w)
                if n is None:
                    n = len(_bpe_encode_word(w, self.ranks))
                    self.memo[w] = n
                total += n
            counts.append(total)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype(np.int64),
                "n_bpe_tokens": pd.Series(counts, dtype="int64"),
            }
        )


def bpe_token_counts(ds, merges, concurrency: int = 4):
    """Tokenize the corpus with a trained merge list: merges broadcast
    once via ray.put, applied by a BPEApplier actor pool (memoized per
    actor) — map-only, zero shuffle."""
    import ray as _ray

    merges_ref = _ray.put(merges)
    return ds.map_batches(
        BPEApplier,
        batch_format="pandas",
        concurrency=concurrency,
        fn_constructor_args=(merges_ref,),
    )
