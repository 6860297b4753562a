"""Text-analysis operators over the documents table (task brief: language
ID, quality scoring, token counting, document fingerprinting) — all
vectorized map_batches stages; the SQL-expressible ones carry DuckDB
oracles in __ray_entry__.

Token semantics contract with the oracle: tokens = split on single space
(' '), matching DuckDB string_split(text, ' ') — the fixture text is
single-spaced.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Mean, Sum

_STOPWORDS = ("the", "a", "to", "of", "and")

# tiny deterministic per-language stopword profiles for the n-gram/stopword
# heuristic language ID (no external models in this sandbox)
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "a", "in", "is"},
    "de": {"der", "die", "das", "und", "ist", "nicht"},
    "fr": {"le", "la", "les", "et", "est", "une"},
}


def _token_count_partials(t: pa.Table) -> pa.Table:
    """Per-batch (term, count) partials, fully Arrow-native: split →
    flatten → value_counts, no Python loop (round 5 — measured 3× over
    the Counter-per-row form at sf0.1, and the gap grows with vocabulary
    size). Shared by vocab_prune and rarity_scores; the combiner half of
    the two-pass broadcast-vocabulary pattern."""
    flat = pc.split_pattern(t["text"], " ").combine_chunks().flatten()
    vc = flat.value_counts()
    return pa.table(
        {"term": vc.field(0), "cnt": pc.cast(vc.field(1), pa.int64())}
    )


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def token_stats(sf_dir: str):
    """Per-language token counters (A1 pattern): tokenize vectorized, ONE
    small groupby over partial counts."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text", "lang", "n_chars"])

    def tok(t: pa.Table) -> pa.Table:
        n_tokens = pc.list_value_length(pc.split_pattern(t["text"], " "))
        return pa.table(
            {
                "lang": t["lang"],
                "n_tokens": pc.cast(n_tokens, pa.int64()),
                "n_chars": t["n_chars"],
            }
        )

    ds = ds.map_batches(tok, batch_format="pyarrow")
    out = ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_tokens", alias_name="sum_tokens"),
        Mean("n_chars", alias_name="avg_chars_e4"),
    )
    from .relational import scale_int

    return out.map_batches(
        lambda t: scale_int(t, {"avg_chars_e4": 10_000}), batch_format="pyarrow"
    )


def quality_scores(sf_dir: str):
    """Per-document quality features: token count, mean token length,
    stopword ratio — the length/stopword heuristics of C4/Gopher-style
    cleaning (public recipes), fully vectorized in Arrow + numpy."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ").combine_chunks()
        n_tokens = pc.cast(pc.list_value_length(toks), pa.int64())
        n_chars = pc.utf8_length(t["text"])
        # stopword OCCURRENCES per doc, loop-free (round 5): flat is_in
        # mask summed per doc via bincount over repeated doc indices
        lens = n_tokens.to_numpy(zero_copy_only=False)
        is_stop = pc.is_in(
            toks.flatten(), value_set=pa.array(list(_STOPWORDS), pa.string())
        ).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        stop_counts = np.bincount(
            doc_idx, weights=is_stop, minlength=len(lens)
        ).astype(np.int64)
        n_tok_np = n_tokens.to_numpy(zero_copy_only=False).astype(np.float64)
        # scaled-int export (floor(x*1e6 + 0.5)) — see relational.scale_int
        stop_ratio = np.floor(
            stop_counts.astype(np.float64)
            / np.maximum(n_tok_np, 1.0)
            * 1_000_000
            + 0.5
        ).astype(np.int64)
        avg_tok_len = np.floor(
            (n_chars.to_numpy(zero_copy_only=False) - (n_tok_np - 1))
            / np.maximum(n_tok_np, 1.0)
            * 1_000_000
            + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": n_tokens,
                "stop_ratio_e6": pa.array(stop_ratio, pa.int64()),
                "avg_tok_len_e6": pa.array(avg_tok_len, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


class LangIdStage:
    """Actor-pool language ID (T6 stateful-stage pattern: marker arrays
    built once per actor in __init__; batches scored fully vectorized —
    round 5: Arrow split/lower + per-lang index_in + distinct
    (doc, marker) count replaces the per-document Python loop; the
    first-max argmax reproduces the loop's tie rule exactly: equal
    counts keep the earlier lang in sorted order, all-zero → 'unk')."""

    HEAD = 200  # only the first HEAD tokens of a doc vote

    def __init__(self):
        self.langs = sorted(_LANG_MARKERS)
        self.marker_arrays = {
            lang: pa.array(sorted(_LANG_MARKERS[lang]), pa.string())
            for lang in self.langs
        }

    def __call__(self, t: pa.Table) -> pa.Table:
        col = pc.split_pattern(pc.utf8_lower(t["text"]), " ").combine_chunks()
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        n_docs = len(lens)
        flat = col.flatten()
        # position-within-doc < HEAD mask, no Python loop
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        pos = np.arange(len(flat)) - np.repeat(starts, lens)
        head = pos < self.HEAD
        flat = flat.filter(pa.array(head))
        doc_idx = np.repeat(np.arange(n_docs), lens)[head]
        counts = np.zeros((len(self.langs), n_docs), np.int64)
        for li, lang in enumerate(self.langs):
            mid = pc.index_in(flat, value_set=self.marker_arrays[lang]).to_numpy(
                zero_copy_only=False
            ).astype(np.float64)
            sel = ~np.isnan(mid)
            if not sel.any():
                continue
            # DISTINCT matched markers per doc (set-intersection size):
            # unique (doc, marker) pairs, then count pairs per doc
            key = doc_idx[sel] * np.int64(64) + mid[sel].astype(np.int64)
            uk = np.unique(key)
            counts[li] = np.bincount(uk >> 6, minlength=n_docs)
        best = np.argmax(counts, axis=0)  # first max wins, like the loop
        names = np.array(self.langs + ["unk"], dtype=object)
        best = np.where(counts.max(axis=0) == 0, len(self.langs), best)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang_pred": pa.array(names[best], pa.string()),
            }
        )


def lang_id(sf_dir: str):
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    # autoscaling actor pool: one actor minimum (model load happens once),
    # up to 8 under load — sized so the stage never starves its peers
    return ds.map_batches(LangIdStage, batch_format="pyarrow", concurrency=(1, 8))


def repetition_scores(sf_dir: str):
    """Gopher-style repetition quality signals (Rae et al. 2021, public
    recipe, §A1.1): per document, the fraction of word-bigrams taken by the
    single most frequent bigram and the fraction of word-trigram
    occurrences that are duplicates — high values flag boilerplate /
    machine-generated text. Round 5: loop-free — factorized token codes,
    doc-boundary window masks and two int-keyed pandas groupbys replace
    the per-document Counters; the float export keeps the loop's exact
    association ((mx * 1e6) / nb, NOT (mx / nb) * 1e6 — they differ by
    one ulp on real inputs and floor(+0.5) amplifies that to an
    off-by-one int vs the DuckDB mirror)."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def _win(codes, doc_idx, ends, n):
        """(doc, code1..codeN) windows not crossing doc boundaries."""
        keep = np.ones(len(codes) - (n - 1), dtype=bool)
        b = ends[:-1]
        for d in range(1, n):
            sel = b - d
            keep[sel[(sel >= 0) & (sel < len(keep))]] = False
        cols = {"doc": doc_idx[: len(keep)][keep]}
        for d in range(n):
            cols[f"c{d}"] = codes[d : len(keep) + d][keep]
        return pd.DataFrame(cols)

    def rep(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ").combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        codes = pd.factorize(toks.flatten().to_pandas().to_numpy())[0].astype(
            np.int64
        )
        n_docs = len(lens)
        doc_idx = np.repeat(np.arange(n_docs), lens)
        ends = np.cumsum(lens)
        nb = np.maximum(lens.astype(np.int64) - 1, 0)
        nt = np.maximum(lens.astype(np.int64) - 2, 0)
        top_bi = np.zeros(n_docs, np.int64)
        dup_tri = np.zeros(n_docs, np.int64)
        if len(codes) >= 2:
            cnt = (
                _win(codes, doc_idx, ends, 2)
                .groupby(["doc", "c0", "c1"], sort=False)
                .size()
            )
            mx = cnt.groupby(level=0).max()
            d = mx.index.to_numpy()
            top_bi[d] = np.floor(
                mx.to_numpy(np.float64) * 1_000_000.0 / nb[d] + 0.5
            ).astype(np.int64)
        if len(codes) >= 3:
            cnt3 = (
                _win(codes, doc_idx, ends, 3)
                .groupby(["doc", "c0", "c1", "c2"], sort=False)
                .size()
            )
            dup = cnt3[cnt3 > 1].groupby(level=0).sum()
            if len(dup):
                d = dup.index.to_numpy()
                dup_tri[d] = np.floor(
                    dup.to_numpy(np.float64) * 1_000_000.0 / nt[d] + 0.5
                ).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bigrams": pa.array(nb, pa.int64()),
                "top_bigram_frac_e6": pa.array(top_bi, pa.int64()),
                "dup_trigram_frac_e6": pa.array(dup_tri, pa.int64()),
            }
        )

    return ds.map_batches(rep, batch_format="pyarrow")


def tfidf_top_terms(sf_dir: str, k: int = 5):
    """Corpus-level term statistics: top-k terms per language by a
    tf·idf-flavoured score (tf scaled by inverse document frequency;
    integer-exact export floor(tf*1e6/df + 0.5) — ln() is NOT bit-stable
    across engines, plain division is). Distributed shape: per-batch
    partial (lang, term) counts and per-batch distinct (term, doc) pairs
    (each doc lives in exactly one batch row, so batch-distinct pairs are
    globally distinct) → two small groupbys over partials → df attached
    with a co-grouped merge (no driver-side vocabulary) → per-batch
    partial top-k, driver merges k × #langs × #batches rows."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text", "lang"])

    def partials(t: pa.Table) -> pa.Table:
        # loop-free (round 5): flat token array + pandas hash-groupbys
        # replace the per-document Counter updates. tf = (lang, term)
        # occurrence counts; df = per-batch distinct (doc, term) pairs
        # (each doc lives in exactly one batch, so batch-distinct pairs
        # are globally distinct). Partial row order is irrelevant — both
        # streams feed a groupby.
        toks = pc.split_pattern(t["text"], " ").combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        term = toks.flatten().to_pandas().to_numpy()
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        lang = np.repeat(
            np.asarray(t["lang"].to_pylist(), dtype=object), lens
        )
        tf = (
            pd.DataFrame({"lang": lang, "term": term})
            .groupby(["lang", "term"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        dfc = (
            pd.DataFrame({"doc": doc_idx, "term": term})
            .drop_duplicates()
            .groupby("term", sort=False)
            .size()
            .reset_index(name="df")
        )
        return pa.table(
            {
                "lang": pa.array(
                    np.concatenate([tf["lang"].to_numpy(), np.full(len(dfc), "", object)]),
                    pa.string(),
                ),
                "term": pa.array(
                    np.concatenate([tf["term"].to_numpy(), dfc["term"].to_numpy()]),
                    pa.string(),
                ),
                "tf": pa.array(
                    np.concatenate([tf["tf"].to_numpy(np.int64), np.zeros(len(dfc), np.int64)]),
                    pa.int64(),
                ),
                "df": pa.array(
                    np.concatenate([np.zeros(len(tf), np.int64), dfc["df"].to_numpy(np.int64)]),
                    pa.int64(),
                ),
            }
        )

    def per_term(g: pd.DataFrame) -> pd.DataFrame:
        df_total = int(g["df"].sum())
        out = g[g["tf"] > 0].groupby("lang", as_index=False).agg(tf=("tf", "sum"))
        if out.empty:
            return pd.DataFrame({"lang": [], "term": [], "tf": [], "df": [], "score_e6": []})
        out["term"] = g["term"].iloc[0]
        out["df"] = df_total
        out["score_e6"] = np.floor(
            out["tf"].to_numpy(np.float64) * 1_000_000 / df_total + 0.5
        ).astype(np.int64)
        return out[["lang", "term", "tf", "df", "score_e6"]]

    scored = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("term")
        .map_groups(per_term, batch_format="pandas")
    )

    def local_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(
            ["lang", "score_e6", "term"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        return pa.Table.from_pandas(
            df.groupby("lang", sort=False).head(k), preserve_index=False
        )

    parts = scored.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(
        ["lang", "score_e6", "term"], ascending=[True, False, True], kind="mergesort"
    )
    top = parts.groupby("lang", sort=False).head(k).reset_index(drop=True)
    top["rk"] = top.groupby("lang").cumcount() + 1
    return pa.table(
        {
            "lang": pa.array(top["lang"].tolist(), pa.string()),
            "term": pa.array(top["term"].tolist(), pa.string()),
            "tf": pa.array(top["tf"].to_numpy(), pa.int64()),
            "df": pa.array(top["df"].to_numpy(), pa.int64()),
            "score_e6": pa.array(top["score_e6"].to_numpy(), pa.int64()),
            "rk": pa.array(top["rk"].to_numpy(), pa.int64()),
        }
    )


def top_ngrams(sf_dir: str, n: int = 2, k: int = 20):
    """Corpus-level n-gram frequency table, top-k by count (the n-gram
    statistics pass of LLM-corpus analysis). Distributed shape: per-batch
    Arrow-native partials — n shifted zero-copy slices of the flat token
    array joined with binary_join_element_wise(" "), doc-boundary starts
    masked out, value_counts per batch (one row per distinct n-gram per
    batch — the combiner pattern, so the groupby shuffles counts, not
    occurrences) → ONE small groupby sum → per-batch partial top-k →
    driver merges k rows per block. Ties broken by n-gram text for
    determinism."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def partials(t: pa.Table) -> pa.Table:
        col = pc.split_pattern(t["text"], " ").combine_chunks()
        flat = col.flatten()
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        tot = len(flat)
        if tot < n:
            return pa.table(
                {"ngram": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        gram = pc.binary_join_element_wise(
            *[flat.slice(i, tot - n + 1) for i in range(n)], " "
        )
        keep = np.ones(tot - n + 1, dtype=bool)
        # windows never cross a doc boundary: kill the last n-1 start
        # positions of every doc but the final one
        b = np.cumsum(lens)[:-1]
        for j in range(1, n):
            idx = b - j
            keep[idx[(idx >= 0) & (idx < len(keep))]] = False
        vc = pc.value_counts(pc.filter(gram, pa.array(keep)))
        return pa.table(
            {
                "ngram": vc.field("values").cast(pa.string()),
                "cnt": vc.field("counts"),
            }
        )

    agg = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("ngram")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def local_topk(t: pa.Table) -> pa.Table:
        df = (
            t.to_pandas()
            .sort_values(["cnt", "ngram"], ascending=[False, True], kind="mergesort")
            .head(k)
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = agg.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    top = (
        parts.sort_values(["cnt", "ngram"], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "ngram": pa.array(top["ngram"].tolist(), pa.string()),
            "cnt": pa.array(top["cnt"].to_numpy(), pa.int64()),
            "rk": pa.array(np.arange(1, len(top) + 1), pa.int64()),
        }
    )


def vocab_prune(sf_dir: str, min_count: int = 100):
    """Rare-token replacement (vocabulary pruning): tokens whose global
    corpus count < min_count become '<unk>'. Two passes: (1) per-batch
    token-count partials → small groupby sum → the KEEP vocabulary
    (count ≥ min_count). Partitioning assumption: the keep set is the
    Zipf HEAD of the vocabulary, bounded for any fixed min_count, so it
    broadcasts via ray.put; the unbounded rare TAIL never leaves the
    aggregate. (2) map_batches rewrite against the broadcast set."""
    import ray

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    vocab = (
        ds.map_batches(_token_count_partials, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t["cnt"], min_count)),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    keep_ref = ray.put(pa.array(sorted(vocab["term"].tolist()), pa.string()))

    def prune(t: pa.Table) -> pa.Table:
        # loop-free rewrite (round 5): flat is_in mask → if_else '<unk>'
        # substitution → rebuild the list layout → binary_join; n_unk is
        # a bincount of the negated mask per doc
        keep = ray.get(keep_ref)
        toks = pc.split_pattern(t["text"], " ").combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        ok = pc.is_in(flat, value_set=keep)
        replaced = pc.if_else(ok, flat, pa.scalar("<unk>", pa.string()))
        offs = pa.array(
            np.concatenate([[0], np.cumsum(lens)]).astype(np.int32), pa.int32()
        )
        pruned = pc.binary_join(
            pa.ListArray.from_arrays(offs, replaced), pa.scalar(" ")
        )
        n_unk = np.bincount(
            np.repeat(np.arange(len(lens)), lens),
            weights=pc.invert(ok).to_numpy(zero_copy_only=False),
            minlength=len(lens),
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text_pruned": pruned,
                "n_unk": pa.array(n_unk, pa.int64()),
            }
        )

    return ds.map_batches(prune, batch_format="pyarrow")


def bm25_topk(
    sf_dir: str,
    terms: tuple = ("merge", "join", "stream"),
    k: int = 10,
):
    """BM25 text retrieval (Robertson/Sparck Jones, public formula,
    k1=1.5 b=0.75) with a raw idf ratio (N-df+0.5)/(df+0.5) instead of
    its log — ln() is not bit-stable across engines. Per-term
    contributions are floored to int micro-units BEFORE summing so the
    doc score is an order-independent integer sum (float += order would
    differ between engines). Distributed shape: one partial pass for
    corpus stats (N, total tokens, per-term df — scalars broadcast via
    closure), one scoring pass with per-batch partial top-k."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    tset = tuple(sorted(terms))

    tset_arr = pa.array(list(tset), pa.string())

    def _flat(t: pa.Table):
        toks = pc.split_pattern(t["text"], " ").combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        mid = pc.index_in(toks.flatten(), value_set=tset_arr).to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        sel = ~np.isnan(mid)
        return lens, doc_idx[sel], mid[sel].astype(np.int64)

    def stat_partials(t: pa.Table) -> pa.Table:
        # loop-free (round 5): df per term = distinct (doc, term) pairs
        # via np.unique over combined keys, like LangIdStage
        lens, docs, mids = _flat(t)
        uk = np.unique(docs * np.int64(len(tset)) + mids)
        dfv = np.bincount(uk % len(tset), minlength=len(tset)).astype(np.int64)
        rows_t = [""] + list(tset)
        return pa.table(
            {
                "term": pa.array(rows_t, pa.string()),
                "df": pa.array(np.concatenate([[0], dfv]), pa.int64()),
                "n_docs": pa.array(
                    [t.num_rows] + [0] * len(tset), pa.int64()
                ),
                "sum_dl": pa.array(
                    [int(lens.sum())] + [0] * len(tset), pa.int64()
                ),
            }
        )

    stats = (
        ds.map_batches(stat_partials, batch_format="pyarrow")
        .groupby("term")
        .aggregate(
            Sum("df", alias_name="df"),
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_dl", alias_name="sum_dl"),
        )
        .to_pandas()
    )
    n_docs = int(stats["n_docs"].sum())
    avgdl = (float(stats["sum_dl"].sum()) * 1.0) / float(n_docs)
    df_of = dict(zip(stats["term"], stats["df"]))

    idf_vec = np.array(
        [
            (n_docs - int(df_of[w]) + 0.5) / (int(df_of[w]) + 0.5)
            for w in tset
        ],
        np.float64,
    )

    def score(t: pa.Table) -> pa.Table:
        # loop-free (round 5): tf[doc, term] via one bincount over
        # combined (doc, term) keys; the float expression keeps the
        # loop's exact IEEE op order (tf*2.5/den*idf*1e6, left-assoc) so
        # the int export is bit-identical to the old per-doc form
        lens, docs, mids = _flat(t)
        T = len(tset)
        tf = np.bincount(docs * np.int64(T) + mids, minlength=len(lens) * T)
        tf = tf.reshape(len(lens), T).astype(np.float64)
        dl = lens.astype(np.float64)
        den = tf + 1.5 * ((1.0 - 0.75) + (0.75 * dl)[:, None] / avgdl)
        contrib = np.floor(
            tf * 2.5 / den * idf_vec[None, :] * 1_000_000.0 + 0.5
        ).astype(np.int64)
        contrib[tf == 0.0] = 0
        total = contrib.sum(axis=1)
        keep = total > 0
        return pa.table(
            {
                "doc_id": pa.array(
                    t["doc_id"].to_numpy(zero_copy_only=False)[keep].astype(np.int64),
                    pa.int64(),
                ),
                "score_e6": pa.array(total[keep], pa.int64()),
            }
        )

    def local_topk(t: pa.Table) -> pa.Table:
        df = (
            t.to_pandas()
            .sort_values(["score_e6", "doc_id"], ascending=[False, True], kind="mergesort")
            .head(k)
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = (
        ds.map_batches(score, batch_format="pyarrow")
        .map_batches(local_topk, batch_format="pyarrow")
        .to_pandas()
    )
    top = (
        parts.sort_values(["score_e6", "doc_id"], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "doc_id": pa.array(top["doc_id"].to_numpy(), pa.int64()),
            "score_e6": pa.array(top["score_e6"].to_numpy(), pa.int64()),
            "rk": pa.array(np.arange(1, len(top) + 1), pa.int64()),
        }
    )


def contamination_check(sf_dir: str, n_bench: int = 5, n: int = 3):
    """Benchmark decontamination (the n-gram-overlap check of public LLM
    training recipes): flag corpus documents whose token n-grams overlap a
    benchmark set (here: doc_id < n_bench stands in for the eval set).
    Distributed shape: the benchmark n-gram set is bounded by the
    benchmark's size — built once with a filtered scan and broadcast via
    ray.put; the corpus streams, each batch counting its docs' DISTINCT
    grams against the broadcast set. Emits per-doc distinct-gram counts,
    hit counts and the contamination fraction (floor-e6)."""
    import ray

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def grams_of(text: str):
        toks = text.split(" ")
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }

    def bench_grams(t: pa.Table) -> pa.Table:
        out: set = set()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        for doc_id, text in zip(ids, t["text"].to_pylist()):
            if doc_id < n_bench:
                out |= grams_of(text)
        return pa.table({"gram": pa.array(sorted(out), pa.string())})

    bench = (
        ds.map_batches(bench_grams, batch_format="pyarrow")
        .to_pandas()["gram"]
        .tolist()
    )
    bench_ref = ray.put(frozenset(bench))

    def check(t: pa.Table) -> pa.Table:
        # loop-free (round 5, the trigram_lift window trick): flat token
        # array + doc-boundary keep mask → vectorized gram strings →
        # distinct (doc, gram) via drop_duplicates → isin(broadcast set)
        bg = ray.get(bench_ref)
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = pc.split_pattern(t["text"], " ").combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten().to_pandas().to_numpy()
        ids, n_g, n_hit, frac = [], [], [], []
        if len(flat) >= n:
            keep = np.ones(len(flat) - (n - 1), dtype=bool)
            ends = np.cumsum(lens)
            b = ends[:-1]
            for d in range(1, n):
                sel = b - d
                keep[sel[(sel >= 0) & (sel < len(keep))]] = False
            doc_of = np.repeat(np.arange(len(lens)), lens)[: len(keep)]
            gram = pd.Series(flat[: len(keep)][keep])
            for d in range(1, n):
                gram = gram + " " + pd.Series(flat[d : len(keep) + d][keep])
            df = pd.DataFrame(
                {"doc": doc_of[keep], "gram": gram.to_numpy()}
            ).drop_duplicates()
            df = df[doc_ids[df["doc"]] >= n_bench]
            if len(df):
                hit = df["gram"].isin(bg)
                agg = pd.DataFrame({"doc": df["doc"], "hit": hit}).groupby(
                    "doc", sort=True
                ).agg(n_g=("hit", "size"), n_hit=("hit", "sum"))
                ids = doc_ids[agg.index.to_numpy()].tolist()
                n_g = agg["n_g"].astype(np.int64).tolist()
                n_hit = agg["n_hit"].astype(np.int64).tolist()
                frac = np.floor(
                    agg["n_hit"].to_numpy(np.float64) * 1_000_000.0
                    / agg["n_g"].to_numpy(np.float64)
                    + 0.5
                ).astype(np.int64).tolist()
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_grams": pa.array(n_g, pa.int64()),
                "n_contaminated": pa.array(n_hit, pa.int64()),
                "frac_e6": pa.array(frac, pa.int64()),
            }
        )

    return ds.map_batches(check, batch_format="pyarrow")


def doc_fingerprints(sf_dir: str, window: int = 4, keep_mod: int = 8):
    """Winnowing-style document fingerprints (Schleimer et al., SIGMOD 2003
    flavor, simplified): rolling hash over token windows, keep hashes ≡ 0
    (mod keep_mod) → per-doc fingerprint count + min fingerprint (hex).

    Round-4 (VERDICT r3 #5): the window hash is the shared vectorized
    token-fold (dedup._fold_windows — distinct-token md5 once per batch,
    k numpy fold passes), not per-window Python md5 of joined strings.
    The SQL mirror runs the identical fold CTE chain. No short-doc
    fallback window here: docs with < `window` tokens have none."""
    from .dedup import _fold_windows, _token_hash_concat_arrow

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        th, counts = _token_hash_concat_arrow(t["text"])
        acc, m = _fold_windows(th, counts, window, short_fallback=False)
        keep = acc % np.uint64(keep_mod) == 0
        # per-doc segment reductions over the kept windows
        starts = np.zeros(len(m), dtype=np.int64)
        starts[1:] = np.cumsum(m)[:-1]
        n_out, min_out = [], []
        for d in range(t.num_rows):
            sel = acc[starts[d] : starts[d] + m[d]][keep[starts[d] : starts[d] + m[d]]]
            n_out.append(len(sel))
            min_out.append(f"{int(sel.min()):016x}" if len(sel) else "")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_fingerprints": pa.array(n_out, pa.int64()),
                "min_fingerprint": pa.array(min_out, pa.string()),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow")


def domain_stats(sf_dir: str):
    """Per-source corpus profile (the per-domain quality table of a
    training-data pipeline): document count, distinct-text count (exact
    dedup within the source) and total token mass. Shape: one shuffle on
    (source, content-hash) — polars two-seed xxhash, the exact_dedup key
    (the oracle groups by raw text, so the hash choice is free) — then
    bounded per-block source partials merged on the driver. Every value
    is an integer count/sum: exact vs the oracle at any scale."""
    import polars as pl

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["source", "text"])

    def prep(t: pa.Table) -> pa.Table:
        n_tokens = pc.cast(
            pc.list_value_length(pc.split_pattern(t["text"], " ")), pa.int64()
        )
        s = pl.from_arrow(t["text"])
        return pa.table(
            {
                "source": t["source"],
                "h1": pa.array(s.hash(seed=1).to_numpy(), pa.uint64()),
                "h2": pa.array(s.hash(seed=2).to_numpy(), pa.uint64()),
                "n_tokens": n_tokens,
            }
        )

    from ray.data.aggregate import Min

    grouped = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["source", "h1", "h2"])
        .aggregate(Count(alias_name="c"), Min("n_tokens", alias_name="tok"))
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(toks=df["c"].to_numpy(np.int64) * df["tok"].to_numpy(np.int64))
        return df.groupby("source", as_index=False).agg(
            n_docs=("c", "sum"), n_distinct=("c", "size"), sum_tokens=("toks", "sum")
        )

    # bounded: ≤ |sources| rows per block → tiny driver merge
    partials = grouped.map_batches(partial, batch_format="pandas").to_pandas()
    agg = partials.groupby("source", as_index=False).agg(
        n_docs=("n_docs", "sum"),
        n_distinct=("n_distinct", "sum"),
        sum_tokens=("sum_tokens", "sum"),
    )
    agg = agg.sort_values("source", kind="mergesort").reset_index(drop=True)
    agg = agg.astype({"n_docs": np.int64, "n_distinct": np.int64, "sum_tokens": np.int64})
    return pa.Table.from_pandas(agg, preserve_index=False)


def type_token_ratio(sf_dir: str):
    """Type-token ratio per document (lexical-diversity quality signal,
    Gopher-family): distinct tokens / total tokens, exported as the
    repo-wide scaled int with the d*1e6/n association (the
    repetition_scores lesson — match the oracle's float association
    exactly). Arrow-vectorized per batch: dictionary-encode the flat
    token array once, then distinct-per-doc = unique (doc, code) pairs
    counted with one bincount — no per-document Python."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def ttr(t: pa.Table) -> pa.Table:
        col = pc.split_pattern(t["text"], " ").combine_chunks()
        lens = (
            pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        enc = col.flatten().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nvocab = max(len(enc.dictionary), 1)
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        up = np.unique(doc_idx * nvocab + codes)
        d = np.bincount(up // nvocab, minlength=len(lens)).astype(np.int64)
        r = np.floor(d * 1_000_000.0 / np.maximum(lens, 1) + 0.5).astype(np.int64)
        r[lens == 0] = 0
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(lens, pa.int64()),
                "ttr_e6": pa.array(r, pa.int64()),
            }
        )

    return ds.map_batches(ttr, batch_format="pyarrow")


def lang_length_percentiles(sf_dir: str):
    """Per-language document-length percentiles (the length-filter tuning
    primitive of corpus curation): p25/p50/p75/p95 of token count per
    lang, quantile_disc semantics (sorted[ceil(q*n) - 1]). Lengths are
    integers end to end — no float anywhere, exact vs the oracle.
    Distributed shape: token counting is a vectorized pyarrow pass per
    batch (split_pattern + list_value_length — text never reaches the
    shuffle, only (lang, len) pairs move); the per-lang sort runs in
    map_groups over the bounded lang cardinality."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["lang", "text"])

    def lens(t: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern(t["text"], " "))
        return pa.table({"lang": t["lang"], "len": pc.cast(n, pa.int64())})

    def q(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["len"].to_numpy(np.int64))
        n = len(v)
        pick = lambda qq: int(v[int(np.ceil(qq * n)) - 1])
        return pd.DataFrame(
            {
                "lang": [g["lang"].iloc[0]],
                "n_docs": [n],
                "p25_len": [pick(0.25)],
                "p50_len": [pick(0.5)],
                "p75_len": [pick(0.75)],
                "p95_len": [pick(0.95)],
            }
        )

    return (
        ds.map_batches(lens, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(q, batch_format="pandas")
    )


def bigram_lift(sf_dir: str, k: int = 50):
    """Collocation extraction (the PMI-style phrase-mining primitive of
    corpus curation): the top-k bigrams by corpus count, with their
    unigram counts and lift_e6 = floor(N·c12·1e6 / (c1·c2) + 0.5) where
    N is the total bigram count. c12/c1/c2/N are exact int64 counts; the
    (N·c12) int product is exact, and the single ·1e6-then-divide runs
    as the same two correctly-rounded double ops in numpy and DuckDB
    (repo-wide single-division argument), so the export hashes equal.
    Distributed shape: per-batch Arrow-native bigram counting — joined
    "w1\\x00w2" keys built with binary_join_element_wise over zero-copy
    token slices, value_counts per batch, the N scalar fused into the
    same pass as a sentinel "N" row (a real key always contains the
    \\x00 separator, so no collision) — text never reaches the shuffle,
    only (key, count) partials; one single-string-key groupby (cheaper
    on the wire than two keys, and \\x00 < every token byte makes joined
    lexicographic order equal tuple order, so top-k tie-breaks match the
    oracle's ORDER BY w1, w2), per-block partial top-k, bounded driver
    merge; unigram counts for the ≤ 2k winner words come from a second
    broadcast-filtered pass (never a full vocabulary build)."""
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def pair_counts(t: pa.Table) -> pa.Table:
        col = pc.split_pattern(t["text"], " ").combine_chunks()
        flat = col.flatten()
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        n = len(flat)
        # N partial = Σ_docs (len - 1), fused here (saves a full scan)
        n_part = int(lens.sum()) - len(lens)
        if n < 2:
            return pa.table(
                {"kk": pa.array(["N"]), "c12": pa.array([n_part], pa.int64())}
            )
        keep = np.ones(n - 1, dtype=bool)
        keep[np.cumsum(lens)[:-1] - 1] = False  # never cross a doc boundary
        key = pc.binary_join_element_wise(
            flat.slice(0, n - 1), flat.slice(1, n - 1), "\x00"
        )
        vc = pc.value_counts(pc.filter(key, pa.array(keep)))
        return pa.table(
            {
                "kk": pa.concat_arrays(
                    [vc.field("values").cast(pa.string()), pa.array(["N"])]
                ),
                "c12": pa.concat_arrays(
                    [vc.field("counts"), pa.array([n_part], pa.int64())]
                ),
            }
        )

    parts = ds.map_batches(pair_counts, batch_format="pyarrow")
    agg = parts.groupby("kk").aggregate(Sum("c12", alias_name="c12"))

    def block_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        sent = df[df["kk"] == "N"]  # the fully-aggregated N row rides along
        df = df[df["kk"] != "N"].sort_values(
            ["c12", "kk"], ascending=[False, True], kind="mergesort"
        )
        return pa.Table.from_pandas(
            pd.concat([df.head(k), sent]), preserve_index=False
        )

    # bounded merges: ≤ k × #blocks top-k rows + the sentinel row
    top = agg.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    n_total = int(top.loc[top["kk"] == "N", "c12"].sum())
    top = (
        top[top["kk"] != "N"]
        .sort_values(["c12", "kk"], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    _parts = top["kk"].str.split("\x00")
    top["w1"], top["w2"] = _parts.str[0], _parts.str[1]

    words = sorted(set(top["w1"]) | set(top["w2"]))
    wset = pa.array(words, pa.string())

    def uni_counts(t: pa.Table) -> pa.Table:
        flat = pc.split_pattern(t["text"], " ").combine_chunks().flatten()
        vc = pc.value_counts(pc.filter(flat, pc.is_in(flat, value_set=wset)))
        return pa.table(
            {"w": vc.field("values").cast(pa.string()), "c": vc.field("counts")}
        )

    # bounded merge: ≤ 2k winner words × #batches
    uc = (
        ds.map_batches(uni_counts, batch_format="pyarrow")
        .to_pandas()
        .groupby("w")["c"]
        .sum()
    )
    c12 = top["c12"].to_numpy(np.int64)
    c1 = uc.reindex(top["w1"]).to_numpy(np.int64)
    c2 = uc.reindex(top["w2"]).to_numpy(np.int64)
    lift = np.floor(
        (np.int64(n_total) * c12).astype(np.float64)
        * 1_000_000.0
        / (c1 * c2).astype(np.float64)
        + 0.5
    ).astype(np.int64)
    return pa.table(
        {
            "w1": pa.array(top["w1"].tolist(), pa.string()),
            "w2": pa.array(top["w2"].tolist(), pa.string()),
            "c12": pa.array(c12, pa.int64()),
            "c1": pa.array(c1, pa.int64()),
            "c2": pa.array(c2, pa.int64()),
            "lift_e6": pa.array(lift, pa.int64()),
        }
    )


def trigram_lift(sf_dir: str, k: int = 50):
    """Trigram collocation extraction (round-5, the PLAN_r5 remaining
    SQL-mirrorable idea): the top-k word trigrams by corpus count, with
    their component-BIGRAM counts and the bridge lift
    lift_e6 = floor(N·c123·1e6 / (c12·c23) + 0.5) — how much more often
    w1w2w3 occurs than its two overlapping bigrams predict (the trigram
    extension of `bigram_lift`'s PMI-style score). N·c123 and c12·c23
    are exact int64 products; the single ·1e6-then-divide runs as the
    same two correctly-rounded double ops in numpy and DuckDB (the
    bigram_lift export argument), so the hash matches.

    Distributed shape (the bigram_lift template): per-batch Arrow-native
    trigram counting — joined "w1\\x00w2\\x00w3" keys from zero-copy
    token slices, value_counts per batch, the N scalar fused into the
    same pass as a sentinel "N" row (text never reaches the shuffle,
    only (key, count) partials), one single-string-key groupby (\\x00 <
    every token byte, so joined lexicographic order equals tuple order
    and top-k tie-breaks match the oracle), per-block partial top-k,
    bounded driver merge; bigram counts for the ≤ 2k winner pairs come
    from a second broadcast-filtered pass (never a full
    bigram-vocabulary build)."""
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def tri_counts(t: pa.Table) -> pa.Table:
        col = pc.split_pattern(t["text"], " ").combine_chunks()
        flat = col.flatten()
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        n = len(flat)
        # N partial = Σ_docs max(len-2, 0), fused here (saves a full scan)
        n_part = int(np.maximum(lens - 2, 0).sum())
        if n < 3:
            return pa.table(
                {"kk": pa.array(["N"]), "c123": pa.array([n_part], pa.int64())}
            )
        keep = np.ones(n - 2, dtype=bool)
        # windows never cross a doc boundary: kill the last TWO start
        # positions of every doc but the final one
        b = np.cumsum(lens)[:-1]
        keep[b[b - 1 < len(keep)] - 1] = False
        keep[b[b - 2 >= 0] - 2] = False
        key = pc.binary_join_element_wise(
            flat.slice(0, n - 2), flat.slice(1, n - 2), flat.slice(2, n - 2), "\x00"
        )
        vc = pc.value_counts(pc.filter(key, pa.array(keep)))
        return pa.table(
            {
                "kk": pa.concat_arrays(
                    [vc.field("values").cast(pa.string()), pa.array(["N"])]
                ),
                "c123": pa.concat_arrays(
                    [vc.field("counts"), pa.array([n_part], pa.int64())]
                ),
            }
        )

    parts = ds.map_batches(tri_counts, batch_format="pyarrow")
    agg = parts.groupby("kk").aggregate(Sum("c123", alias_name="c123"))

    def block_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        sent = df[df["kk"] == "N"]  # the fully-aggregated N row rides along
        df = df[df["kk"] != "N"].sort_values(
            ["c123", "kk"], ascending=[False, True], kind="mergesort"
        )
        return pa.Table.from_pandas(
            pd.concat([df.head(k), sent]), preserve_index=False
        )

    # bounded merges: ≤ k × #blocks top-k rows + the sentinel row
    top = agg.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    n_total = int(top.loc[top["kk"] == "N", "c123"].sum())
    top = (
        top[top["kk"] != "N"]
        .sort_values(["c123", "kk"], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    _sp = top["kk"].str.split("\x00")
    top["w1"], top["w2"], top["w3"] = _sp.str[0], _sp.str[1], _sp.str[2]

    # driver-side key build MUST be pure Python: pandas Series + "\x00"
    # silently drops the NUL (numpy fixed-width unicode pads with NULs)
    k12 = [f"{a}\x00{b}" for a, b in zip(top["w1"], top["w2"])]
    k23 = [f"{a}\x00{b}" for a, b in zip(top["w2"], top["w3"])]
    pair_keys = sorted(set(k12) | set(k23))
    pset = pa.array(pair_keys, pa.string())

    def pair_counts_for(t: pa.Table) -> pa.Table:
        col = pc.split_pattern(t["text"], " ").combine_chunks()
        flat = col.flatten()
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        n = len(flat)
        if n < 2:
            return pa.table(
                {"pk": pa.array([], pa.string()), "c": pa.array([], pa.int64())}
            )
        keep = np.ones(n - 1, dtype=bool)
        keep[np.cumsum(lens)[:-1] - 1] = False  # never cross a doc boundary
        key = pc.filter(
            pc.binary_join_element_wise(
                flat.slice(0, n - 1), flat.slice(1, n - 1), "\x00"
            ),
            pa.array(keep),
        )
        vc = pc.value_counts(pc.filter(key, pc.is_in(key, value_set=pset)))
        return pa.table(
            {"pk": vc.field("values").cast(pa.string()), "c": vc.field("counts")}
        )

    # bounded merge: ≤ 2k winner pairs × #batches. pandas hashing
    # (groupby/reindex/factorize) TRUNCATES object strings at the first
    # NUL, so the tiny driver merge is a pure-Python dict — Python str
    # hashing is NUL-exact.
    pdf = ds.map_batches(pair_counts_for, batch_format="pyarrow").to_pandas()
    bc: dict = {}
    if "pk" in pdf.columns:
        for pk_, c_ in zip(pdf["pk"], pdf["c"]):
            bc[pk_] = bc.get(pk_, 0) + int(c_)
    c123 = top["c123"].to_numpy(np.int64)
    c12 = np.array([bc[x] for x in k12], dtype=np.int64)
    c23 = np.array([bc[x] for x in k23], dtype=np.int64)
    lift = np.floor(
        (np.int64(n_total) * c123).astype(np.float64)
        * 1_000_000.0
        / (c12 * c23).astype(np.float64)
        + 0.5
    ).astype(np.int64)
    return pa.table(
        {
            "w1": pa.array(top["w1"].tolist(), pa.string()),
            "w2": pa.array(top["w2"].tolist(), pa.string()),
            "w3": pa.array(top["w3"].tolist(), pa.string()),
            "c123": pa.array(c123, pa.int64()),
            "c12": pa.array(c12, pa.int64()),
            "c23": pa.array(c23, pa.int64()),
            "lift_e6": pa.array(lift, pa.int64()),
        }
    )


def word_freq_histogram(sf_dir: str, cap: int = 100):
    """Zipf profile of the corpus vocabulary (the vocabulary-growth /
    tokenizer-sizing signal): for each occurrence count f (capped at
    `cap`, higher counts pooled into the overflow bucket), how many
    distinct words occur exactly f times. Pure integer counts — exact.
    Distributed shape: per-batch partial word counts (combiner), ONE
    groupby over the vocabulary (the only unbounded exchange — counts
    only, 16 bytes/word), then a per-block counts-of-counts partial
    (≤ cap+1 rows per block) and a bounded driver merge. The histogram
    itself never exceeds cap+1 rows anywhere."""
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def tok_counts(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(
            pc.split_pattern(t["text"], " ").combine_chunks().flatten()
        )
        return pa.table(
            {"w": vc.field("values").cast(pa.string()), "c": vc.field("counts")}
        )

    agg = (
        ds.map_batches(tok_counts, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("c", alias_name="c"))
    )

    def fof(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        f = np.minimum(c, np.int64(cap))
        binc = np.bincount(f, minlength=cap + 1)
        nz = np.flatnonzero(binc)
        return pa.table(
            {
                "freq": pa.array(nz.astype(np.int64), pa.int64()),
                "n_words": pa.array(binc[nz].astype(np.int64), pa.int64()),
            }
        )

    # bounded merge: ≤ (cap+1) × #blocks tiny histogram partials
    parts = agg.map_batches(fof, batch_format="pyarrow").to_pandas()
    out = parts.groupby("freq", sort=True)["n_words"].sum().reset_index()
    return pa.table(
        {
            "freq": pa.array(out["freq"].to_numpy(np.int64), pa.int64()),
            "n_words": pa.array(out["n_words"].to_numpy(np.int64), pa.int64()),
        }
    )


def char_trigram_topk(sf_dir: str, k: int = 20):
    """Per-language character-trigram profile (the feature table of
    n-gram language identifiers, cf. Cavnar & Trenkle 1994): the top-k
    trigrams per lang by count, with a deterministic (count DESC, gram)
    rank. Counts are exact ints; the corpus is ASCII so byte positions
    equal DuckDB's character positions. Distributed shape: per-batch
    vectorized counting — one uint8 view per (batch, lang), trigrams as
    base-256 int codes, np.unique — so raw text never reaches the
    shuffle, only (lang, gram, count) partials; one bounded groupby,
    per-block top-k partials, driver merge ≤ k × #langs × #blocks."""
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        langs = np.asarray(t["lang"].to_pylist(), dtype=object)
        texts = np.asarray(t["text"].to_pylist(), dtype=object)
        out_lang, out_gram, out_c = [], [], []
        for lg in pd.unique(langs):
            # NUL separators make cross-doc windows detectable
            joined = "\x00\x00".join(texts[langs == lg])
            try:
                raw = joined.encode("ascii")
            except UnicodeEncodeError as e:
                # byte positions == char positions only holds for ASCII;
                # fail loud with the actionable cause, not a bare codec
                # traceback deep inside a Ray task
                raise ValueError(
                    "char_trigram_topk requires an ASCII corpus (byte/"
                    "char-position parity with the SQL oracle); found a "
                    f"non-ASCII character in lang={lg!r} documents: {e}"
                ) from e
            blob = np.frombuffer(raw, dtype=np.uint8)
            if len(blob) < 3:
                continue
            a, b, c = (
                blob[:-2].astype(np.int64),
                blob[1:-1].astype(np.int64),
                blob[2:].astype(np.int64),
            )
            valid = (a != 0) & (b != 0) & (c != 0)
            codes = a[valid] * 65536 + b[valid] * 256 + c[valid]
            uniq, cnt = np.unique(codes, return_counts=True)
            out_lang.extend([lg] * len(uniq))
            out_gram.extend(
                chr(u >> 16) + chr((u >> 8) & 255) + chr(u & 255) for u in uniq
            )
            out_c.extend(int(x) for x in cnt)
        return pa.table(
            {
                "lang": pa.array(out_lang, pa.string()),
                "gram": pa.array(out_gram, pa.string()),
                "c": pa.array(out_c, pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "gram"])
        .aggregate(Sum("c", alias_name="c"))
    )

    def block_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(
            ["lang", "c", "gram"], ascending=[True, False, True], kind="mergesort"
        )
        return pa.Table.from_pandas(
            df.groupby("lang", sort=False).head(k), preserve_index=False
        )

    # bounded merge: ≤ k × #langs × #blocks partial rows on the driver
    top = agg.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    top = top.sort_values(
        ["lang", "c", "gram"], ascending=[True, False, True], kind="mergesort"
    )
    top = top.groupby("lang", sort=False).head(k).reset_index(drop=True)
    top["rn"] = top.groupby("lang", sort=False).cumcount() + 1
    return pa.table(
        {
            "lang": pa.array(top["lang"].tolist(), pa.string()),
            "gram": pa.array(top["gram"].tolist(), pa.string()),
            "c": pa.array(top["c"].to_numpy(np.int64), pa.int64()),
            "rn": pa.array(top["rn"].to_numpy(np.int64), pa.int64()),
        }
    )


def source_lang_matrix(sf_dir: str):
    """Corpus-composition contingency matrix (the mixture-audit table of
    corpus curation, complementing the per-source rollup of
    `domain_stats`): per (source, lang) cell, document count, total token
    mass and total character mass — all exact integer counts/sums.
    Distributed shape: one vectorized pyarrow pass per batch (token count
    = split + list_value_length; char count = utf8_length — text never
    leaves the task), per-batch two-key partials, bounded driver merge
    (≤ #sources × #langs × #batches tiny rows)."""
    ds = rd.read_parquet(
        _t(sf_dir, "documents"), columns=["source", "lang", "text"]
    )

    def partial(t: pa.Table) -> pa.Table:
        n_tok = pc.list_value_length(pc.split_pattern(t["text"], " "))
        df = pd.DataFrame(
            {
                "source": t["source"].to_pylist(),
                "lang": t["lang"].to_pylist(),
                "n_tok": n_tok.to_numpy(zero_copy_only=False).astype(np.int64),
                "n_chars": pc.utf8_length(t["text"])
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
            }
        )
        g = (
            df.groupby(["source", "lang"], sort=False)
            .agg(n_docs=("n_tok", "size"), sum_tokens=("n_tok", "sum"), sum_chars=("n_chars", "sum"))
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    # bounded merge: ≤ #sources × #langs × #batches partial rows
    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (
        parts.groupby(["source", "lang"], sort=True)
        .agg(
            n_docs=("n_docs", "sum"),
            sum_tokens=("sum_tokens", "sum"),
            sum_chars=("sum_chars", "sum"),
        )
        .reset_index()
    )
    return pa.table(
        {
            "source": pa.array(out["source"].tolist(), pa.string()),
            "lang": pa.array(out["lang"].tolist(), pa.string()),
            "n_docs": pa.array(out["n_docs"].to_numpy(np.int64), pa.int64()),
            "sum_tokens": pa.array(out["sum_tokens"].to_numpy(np.int64), pa.int64()),
            "sum_chars": pa.array(out["sum_chars"].to_numpy(np.int64), pa.int64()),
        }
    )


def filter_funnel(sf_dir: str):
    """Quality-filter funnel per source (the pipeline-health view of a
    C4/Gopher-style cleaning stack — Raffel et al. 2020 §2.2, Rae et al.
    2021 §A1.1, public recipes): how many documents survive each
    successive rule — token-count window, minimum stopword evidence,
    average-token-length window. Cumulative AND semantics, so every count
    is monotonically non-increasing left to right; the drop between
    adjacent columns attributes removals to one rule. Shape: one
    vectorized map_batches pass (flatten + is_in + add.reduceat for the
    stopword counts — no per-row Python), per-batch partial sums by
    source (≤ |sources| rows per block), tiny driver merge. Integer
    counts end-to-end: exact vs the oracle at any scale. The avg-token-
    length export uses the repo float-association rule (x*1.0/n*1e6,
    matching the quality_scores oracle)."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["source", "text"])
    stop_arr = pa.array(list(_STOPWORDS), pa.string())

    def masks(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ").combine_chunks()
        nt = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(nt) == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_total": pa.array([], pa.int64()),
                    "n_len_ok": pa.array([], pa.int64()),
                    "n_stop_ok": pa.array([], pa.int64()),
                    "n_toklen_ok": pa.array([], pa.int64()),
                }
            )
        # segment-sum stopword hits per doc: every doc has >=1 token
        # (split_pattern of any string yields at least one element), so
        # each reduceat segment start is a valid flat index
        hits = pc.is_in(toks.flatten(), value_set=stop_arr).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        nstop = np.add.reduceat(hits, offs[:-1])
        n_chars = pc.utf8_length(t["text"]).to_numpy(zero_copy_only=False).astype(np.int64)
        atl_e6 = np.floor(
            (n_chars - (nt - 1)) / np.maximum(nt, 1).astype(np.float64) * 1_000_000
            + 0.5
        ).astype(np.int64)
        m_len = (nt >= 30) & (nt <= 90)
        m_stop = m_len & (nstop >= 2)
        m_atl = m_stop & (atl_e6 >= 3_000_000) & (atl_e6 <= 8_000_000)
        df = pd.DataFrame(
            {
                "source": t["source"].to_pylist(),
                "n_total": np.ones(len(nt), np.int64),
                "n_len_ok": m_len.astype(np.int64),
                "n_stop_ok": m_stop.astype(np.int64),
                "n_toklen_ok": m_atl.astype(np.int64),
            }
        )
        g = df.groupby("source", sort=False, as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    # bounded merge: <= |sources| x #blocks partial rows reach the driver
    parts = ds.map_batches(masks, batch_format="pyarrow").to_pandas()
    out = parts.groupby("source", sort=True, as_index=False).sum()
    return pa.table(
        {
            "source": pa.array(out["source"].tolist(), pa.string()),
            "n_total": pa.array(out["n_total"].to_numpy(np.int64), pa.int64()),
            "n_len_ok": pa.array(out["n_len_ok"].to_numpy(np.int64), pa.int64()),
            "n_stop_ok": pa.array(out["n_stop_ok"].to_numpy(np.int64), pa.int64()),
            "n_toklen_ok": pa.array(out["n_toklen_ok"].to_numpy(np.int64), pa.int64()),
        }
    )


def rarity_scores(sf_dir: str):
    """Per-document inverse-frequency mass: rarity = Σ_tokens floor(N / c)
    where c is the token's corpus count and N the corpus token total — an
    integer-exact tf·idf-flavored quality signal (rare-token-heavy
    documents score high) with no float log anywhere. Two passes, like
    vocab_prune: (1) per-batch token-count partials → small groupby sum →
    the full count table. Partitioning assumption: the count table is the
    corpus VOCABULARY, bounded by the Zipf envelope for natural text, so
    it broadcasts via ray.put; an open-vocabulary corpus would instead
    attach counts through the co-partitioned token join ngram_jaccard
    uses. (2) map_batches: dictionary-encode each batch's tokens in
    Arrow, ONE dict lookup per DISTINCT token, np.add.reduceat for
    per-doc int sums."""
    import ray

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    counts = (
        ds.map_batches(_token_count_partials, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    n_total = int(counts["cnt"].sum())
    cmap = dict(zip(counts["term"].tolist(), counts["cnt"].astype(int).tolist()))
    ref = ray.put((n_total, cmap))

    def score(t: pa.Table) -> pa.Table:
        n_tot, cm = ray.get(ref)
        col = pc.split_pattern(t["text"], " ").combine_chunks()
        lens = (
            pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        enc = col.flatten().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        uniq = enc.dictionary.to_pylist()
        contrib = np.array([n_tot // cm[w] for w in uniq], np.int64)[codes]
        offsets = np.concatenate([[0], np.cumsum(lens)[:-1]])
        rarity = np.add.reduceat(contrib, offsets)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(lens, pa.int64()),
                "rarity": pa.array(rarity.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")
