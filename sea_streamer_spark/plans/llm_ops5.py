"""LLM-pipeline queries, part 5 (round-3 continuation wave; ranked in
plans/queries.py (loader-derived ordering since r9) behind the frozen 50-query driver backlog,
like llm_ops4's tail).

Determinism conventions as parts 3/4: integer arithmetic wherever a value
feeds the driver hash; models trained from fixed module-source seeds or the
gate corpus and shipped as literals to both engines; identical total-order
tie-breaks on every ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import langid as L
from ..sources.tables import load_tables
from .registry import query


def _langid_oracle() -> str:
    """DuckDB replay of the Cavnar-Trenkle classifier: identical
    normalization regex, trigram extraction, (count DESC, gram) doc
    ranking, profile literals, out-of-place distance, and first-achiever
    argmin."""
    prof_rows = ",\n      ".join(
        "('" + g.replace("'", "''") + "'," + ",".join(str(r) for r in ranks) + ")"
        for g, *ranks in (list(row) for row in L.profile_rows())
    )
    rank_cols = ", ".join(f"rank_{lang}" for lang in L.LANGS)
    dist_exprs = ",\n             ".join(
        f"CAST(SUM(ABS(rk - COALESCE(rank_{lang}, {L.MISS_PENALTY}))) AS BIGINT)"
        f" AS dist_{lang}"
        for lang in L.LANGS
    )
    least = "LEAST(" + ", ".join(f"dist_{lang}" for lang in L.LANGS) + ")"
    pred_case = (
        "CASE "
        + " ".join(
            f"WHEN dist_{lang} = {least} THEN '{lang}'" for lang in L.LANGS
        )
        + " END"
    )
    zero_dists = ", ".join(f"CAST(0 AS BIGINT) AS dist_{lang}" for lang in L.LANGS)
    return f"""
    WITH norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')) AS nrm
      FROM documents
    ), tri AS (
      SELECT doc_id, substr(nrm, CAST(i AS INTEGER), 3) AS gram
      FROM norm, LATERAL unnest(generate_series(1, len(nrm) - 2)) AS t(i)
      WHERE len(nrm) >= 3
    ), cnt AS (
      SELECT doc_id, gram, COUNT(*) AS cnt FROM tri GROUP BY doc_id, gram
    ), dp AS (
      SELECT doc_id, gram, rk FROM (
        SELECT doc_id, gram,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY cnt DESC, gram) AS rk
        FROM cnt
      ) WHERE rk <= {L.DOC_K}
    ), prof(gram, {rank_cols}) AS (
      VALUES {prof_rows}
    ), dist AS (
      SELECT dp.doc_id,
             {dist_exprs}
      FROM dp LEFT JOIN prof USING (gram)
      GROUP BY dp.doc_id
    ), scored AS (
      SELECT doc_id, {', '.join('dist_' + lang for lang in L.LANGS)},
             {pred_case} AS pred_lang
      FROM dist
    ), missing AS (
      SELECT doc_id, {zero_dists}, 'unknown' AS pred_lang
      FROM norm WHERE len(nrm) < 3
    )
    SELECT * FROM scored
    UNION ALL
    SELECT * FROM missing
    ORDER BY doc_id
    """


@query("text_lang_id_ngram", oracle=_langid_oracle())
def text_lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram language ID (Cavnar-Trenkle rank-distance,
    operators/langid.py): out-of-place distance to each seed-trained
    language profile + first-achiever argmin — upgrade over the
    stopword-marker heuristic `text_lang_id`, all-integer so the driver
    hash checks real predictions. One doc-keyed explode/count/window +
    a broadcast profile join; geometry-bounded everywhere."""
    docs = load_tables(spark, sf_dir, "documents").documents
    return L.lang_id_ngram(docs)


def _qsk_oracle() -> str:
    from ..operators import text as T
    from ..operators.sketch import QSK_K, QSK_QS

    p_exprs = ",\n           ".join(
        f"CAST(MAX(CASE WHEN vrk * 100 >= k_used * {q}"
        f" AND (vrk - 1) * 100 < k_used * {q} THEN v END) AS BIGINT) AS p{q}"
        for q in QSK_QS
    )
    return f"""
    WITH hs AS (
      SELECT source,
             {T.duck_char_fold("md5(CAST(doc_id AS VARCHAR))")} AS h,
             CAST(n_chars AS BIGINT) AS v
      FROM documents
    ), bk AS (
      SELECT source, h, v FROM (
        SELECT source, h, v,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, v) AS rk
        FROM hs
      ) WHERE rk <= {QSK_K}
    ), ranked AS (
      SELECT source, v,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY v, h) AS vrk,
             COUNT(*) OVER (PARTITION BY source) AS k_used
      FROM bk
    )
    SELECT source,
           CAST(MAX(k_used) AS BIGINT) AS k_used,
           {p_exprs}
    FROM ranked GROUP BY source ORDER BY source"""


@query("sketch_quantile_bottomk", oracle=_qsk_oracle(), tags=("llm", "sketch"))
def sketch_quantile_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source n_chars quantile summary from the portable bottom-k
    uniform sample (operators/sketch.bottomk_value_sample): the sketch
    family's distribution member — geometry-bounded (k rows/source at any
    corpus size), mergeable (bottom-k of a union == re-ranked truncation
    of per-part bottom-k's), and — unlike approx_percentile — replayable
    bit-for-bit in SQL, so the driver hash checks the estimates
    themselves. The engine-exact at-scale alternative to the exact
    percentile operator's full-group buffering."""
    from ..operators.sketch import bottomk_value_sample, quantiles_from_sample

    docs = load_tables(spark, sf_dir, "documents").documents
    sample = bottomk_value_sample(docs, "doc_id", "n_chars", "source")
    return quantiles_from_sample(sample, "source")


@query(
    "join_skew_salted",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE)
             AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name ORDER BY n.n_name""",
    tags=("relational", "scale"),
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation supplier revenue through the EXPLICIT skew machinery
    (operators/scale.py): `salted_join` fans each l_suppkey across 8
    sub-keys (supplier side replicated x8, still broadcast-small) and the
    nation rollup runs as a two-stage (key, salt) -> key aggregation —
    no reducer ever owns a hot key's full row set, even with AQE off
    (streaming micro-batches) or a pinned plan. Result is row-identical
    to the plain join+agg, which is exactly what the oracle asserts;
    DECIMAL partials keep the two-stage sum order-independent."""
    from ..operators.scale import salted_join

    t = load_tables(spark, sf_dir, "lineitem", "supplier", "nation")
    li = t.lineitem.select(
        F.col("l_suppkey").alias("suppkey"),
        (
            F.col("l_extendedprice").cast("decimal(12,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(3,2)"))
        ).alias("rev"),
        "l_orderkey",
        "l_linenumber",
    )
    sup = t.supplier.select(
        F.col("s_suppkey").alias("suppkey"), "s_nationkey"
    )
    joined = salted_join(
        li,
        sup,
        ["suppkey"],
        n_salts=8,
        entropy=F.xxhash64("l_orderkey", "l_linenumber"),
    )
    # two-stage skew-safe rollup: (nation, salt-of-row) partials -> nation
    partial = (
        joined.withColumn(
            "_salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(32))
        )
        .groupBy("s_nationkey", "_salt")
        .agg(F.sum("rev").alias("_rev"), F.count(F.lit(1)).alias("_cnt"))
    )
    per_nation = partial.groupBy("s_nationkey").agg(
        F.sum("_rev").alias("_revtot"), F.sum("_cnt").cast("long").alias("n_lineitems")
    )
    nation = t.nation.select("n_nationkey", "n_name")
    return (
        per_nation.join(
            F.broadcast(nation),
            per_nation["s_nationkey"] == nation["n_nationkey"],
        )
        .select(
            "n_name",
            F.col("_revtot").cast("double").alias("revenue"),
            "n_lineitems",
        )
    )


@query(
    "dataset_snapshot_diff",
    oracle="""
    WITH newt AS (
      SELECT doc_id, text FROM documents
    ), old AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' v1' ELSE text END AS text
      FROM documents WHERE doc_id % 10 != 3
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text
      FROM documents WHERE doc_id % 13 = 0
    ), od AS (
      SELECT doc_id, md5(COALESCE(text, chr(1))) AS a FROM old
    ), nd AS (
      SELECT doc_id, md5(COALESCE(text, chr(1))) AS b FROM newt
    ), j AS (
      SELECT COALESCE(od.doc_id, nd.doc_id) AS doc_id, od.a, nd.b
      FROM od FULL OUTER JOIN nd ON od.doc_id = nd.doc_id
    )
    SELECT doc_id,
           CASE WHEN a IS NULL THEN 'added'
                WHEN b IS NULL THEN 'removed'
                WHEN a != b THEN 'changed' END AS change
    FROM j
    WHERE a IS NULL OR b IS NULL OR a != b
    ORDER BY doc_id""",
    tags=("llm", "versioning"),
)
def dataset_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot versioning diff (operators/versioning.snapshot_diff): the
    previous corpus snapshot is reconstructed deterministically from the
    current one (10% of ids absent => 'added', ids ≡0 mod 7 carried a ' v1'
    text => 'changed', a mod-13 slice existed only before => 'removed') and
    diffed via ONE full-outer key join over map-side md5 row digests —
    output scales with the change volume, never the snapshot size. The
    oracle replays the same construction and digest in SQL."""
    from ..operators.versioning import snapshot_diff

    docs = load_tables(spark, sf_dir, "documents").documents
    new = docs.select("doc_id", "text")
    old = (
        docs.filter(F.col("doc_id") % 10 != 3)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v1"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 13 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"
            )
        )
    )
    return snapshot_diff(old, new, ["doc_id"])


def _dhash_oracle() -> str:
    """Positional replay of the dHash pipeline: the synthesized 18x14 PNG's
    pixels are cycled text bytes, nearest-neighbor 9x7 sampling picks
    source pixel (2r, 2c), so every grayscale value — and therefore every
    gradient bit, the 56-bit hash, the pigeonhole blocks, and the hamming
    verification — is closed-form integer arithmetic over
    hex(encode(text))."""
    from ..operators.multimodal import DHASH_H, DHASH_W

    grid = []
    for r in range(DHASH_H):
        for c in range(DHASH_W + 1):
            base = ((2 * r) * 18 + 2 * c) * 3
            grid.append(
                f"{{'r':{r},'c':{c},'p0':{base},'p1':{base+1},'p2':{base+2}}}"
            )
    grid_list = "[" + ", ".join(grid) + "]"
    nib = "'123456789ABCDEF'"

    def bv(p: str) -> str:
        return (
            f"(16 * strpos({nib}, substr(hx, CAST(2*({p} % n) + 1 AS INTEGER), 1))"
            f" + strpos({nib}, substr(hx, CAST(2*({p} % n) + 2 AS INTEGER), 1)))"
        )

    blks = ", ".join(str(b) for b in range(7))
    return f"""
    WITH h AS (
      SELECT doc_id,
             hex(encode(CASE WHEN length(text) > 0 THEN text ELSE 'x' END)) AS hx,
             octet_length(encode(CASE WHEN length(text) > 0 THEN text ELSE 'x' END)) AS n
      FROM documents
    ), g AS (
      SELECT doc_id, u.r AS r, u.c AS c,
             (299 * {bv("u.p0")} + 587 * {bv("u.p1")} + 114 * {bv("u.p2")}) // 1000
               AS gray
      FROM h, unnest({grid_list}) AS t(u)
    ), bits AS (
      SELECT a.doc_id, a.r, a.c,
             CASE WHEN a.gray > b.gray THEN 1 ELSE 0 END AS bit
      FROM g a JOIN g b ON a.doc_id = b.doc_id AND b.r = a.r AND b.c = a.c + 1
      WHERE a.c < {DHASH_W}
    ), hs AS (
      SELECT doc_id,
             CAST(SUM(bit * (1::BIGINT << (r * {DHASH_W} + c))) AS BIGINT) AS dhash
      FROM bits GROUP BY doc_id
    ), blk AS (
      SELECT doc_id, dhash, b AS blk, (dhash >> (b * 8)) & 255 AS blk_val
      FROM hs, unnest([{blks}]) AS t(b)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      a.dhash AS ha, b.dhash AS hb
      FROM blk a JOIN blk b
        ON a.blk = b.blk AND a.blk_val = b.blk_val AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(ha, hb)) <= 6
    ORDER BY doc_a, doc_b"""


@query(
    "multimodal_dhash_neardup",
    oracle=_dhash_oracle(),
    tags=("llm", "multimodal", "dedup"),
)
def multimodal_dhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMAGE near-duplicate search through the real codec path: synthesize
    an 18x14 RGB PNG per document, nearest-neighbor resize to 9x7 (full
    decode/re-encode), 56-bit perceptual gradient hash (dHash) from the
    decoded pixels, then pigeonhole-bucketed pairing at hamming ≤ 6
    (operators/multimodal.dhash_png/dhash_near_dup) — the image-modality
    member of the near-dup family next to MinHash (text) and SimHash
    (tokens). The oracle replays pixels positionally from the text bytes,
    so any corruption in deflate/unfilter/resize/luma/bit packing changes
    the driver hash.

    r13: the synth → resize → hash chain runs as ONE fused mapInPandas
    stage (operators/multimodal.dhash_synth_resized — bit-identical
    composition of the same codec calls, pinned fused-vs-chained): the
    three separate Python stages each paid a JVM↔Python Arrow round-trip
    while the actual per-image Python work is ~0.14 ms/doc (guide §4)."""
    from ..operators import multimodal as M

    docs = load_tables(spark, sf_dir, "documents").documents
    hashes = M.dhash_synth_resized(
        docs, synth_width=18, synth_height=14, width=9, height=7
    )
    return M.dhash_near_dup(hashes)


@query(
    "text_typo_pairs",
    oracle="""
    WITH base AS (
      SELECT DISTINCT lower(unnest(string_split_regex(text, '\\s+'))) AS tok
      FROM documents WHERE length(text) > 0
    ), clean AS (
      SELECT tok FROM base WHERE length(tok) >= 4
    ), typos AS (
      -- deterministic injected corruption: drop the middle character of
      -- every token whose fold-parity selects it (both engines replay)
      SELECT DISTINCT
             substr(tok, 1, (length(tok) / 2)::INTEGER - 1)
             || substr(tok, (length(tok) / 2)::INTEGER + 1,
                       length(tok)) AS tok
      FROM clean WHERE length(tok) % 2 = 0
    ), vocab AS (
      SELECT tok FROM clean UNION SELECT tok FROM typos
    ), keys AS (
      SELECT tok, tok AS k FROM vocab
      UNION ALL
      SELECT tok,
             substr(tok, 1, i - 1) || substr(tok, i + 1, length(tok)) AS k
      FROM vocab, LATERAL unnest(generate_series(1, length(tok))) AS t(i)
    ), cand AS (
      SELECT DISTINCT a.tok AS token_a, b.tok AS token_b
      FROM keys a JOIN keys b ON a.k = b.k AND a.tok < b.tok
    )
    SELECT token_a, token_b FROM cand
    WHERE levenshtein(token_a, token_b) = 1
    ORDER BY token_a, token_b""",
    tags=("llm", "text"),
)
def text_typo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo/spell-variant mining (operators/text.edit1_pairs): the
    SymSpell-style deletion-neighborhood join finds every token pair at
    edit distance exactly 1 without a vocabulary cross product. The clean
    corpus vocabulary contains no such pairs, so — the pii_redaction
    convention — the query deterministically injects middle-character
    deletions for even-length tokens on BOTH engines and mines them back;
    blocking volume scales with vocabulary size, never corpus size."""
    from ..operators.text import edit1_pairs, tokens

    docs = load_tables(spark, sf_dir, "documents").documents
    base = (
        docs.filter(F.length("text") > 0)
        .select(F.explode(tokens(F.lower(F.col("text")))).alias("tok"))
        .filter(F.length("tok") >= 4)
        .distinct()
    )
    typos = (
        base.filter(F.length("tok") % 2 == 0)
        .select(
            F.concat(
                F.expr("substring(tok, 1, CAST(length(tok) / 2 AS INT) - 1)"),
                F.expr(
                    "substring(tok, CAST(length(tok) / 2 AS INT) + 1, length(tok))"
                ),
            ).alias("tok")
        )
        .distinct()
    )
    vocab = base.unionByName(typos).distinct()
    return edit1_pairs(vocab, "tok")


@query(
    "events_funnel_stages",
    oracle="""
    WITH u AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view
      FROM events GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN u USING (user_id)
      WHERE e.event_type = 'click' AND u.t_view IS NOT NULL
        AND e.ts > u.t_view
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT u.user_id,
           CAST(CASE WHEN p.t_purchase IS NOT NULL THEN 3
                     WHEN c.t_click IS NOT NULL THEN 2
                     WHEN u.t_view IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS funnel_stage
    FROM u LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
    ORDER BY user_id""",
    tags=("llm", "events"),
)
def events_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis per user (view -> first click AFTER that
    view -> first purchase AFTER that click — order matters, not mere
    presence): three stacked conditional-min window expressions over ONE
    user-keyed partitioning, so the whole funnel costs a single shuffle
    at any event volume. funnel_stage = deepest stage reached (0-3)."""
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, "events").events.select(
        "user_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "t_view",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & F.col("t_view").isNotNull()
                    & (F.col("ts") > F.col("t_view")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & F.col("t_click").isNotNull()
                    & (F.col("ts") > F.col("t_click")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    stage = (
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .when(F.col("t_view").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        staged.select("user_id", stage.cast("long").alias("funnel_stage"))
        .distinct()
    )


@query(
    "profile_incremental_merge",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS s1,
           CAST(SUM(CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT)) AS BIGINT) AS s2,
           CAST(MIN(n_chars) AS BIGINT) AS mn,
           CAST(MAX(n_chars) AS BIGINT) AS mx,
           CAST((SUM(CAST(n_chars AS BIGINT)) * 1000000)
                // COUNT(*) AS BIGINT) AS mean_micro,
           CAST(((COUNT(*) * SUM(CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT))
                  - SUM(CAST(n_chars AS BIGINT)) * SUM(CAST(n_chars AS BIGINT)))
                 * 1000000) // (COUNT(*) * COUNT(*)) AS BIGINT) AS var_micro
    FROM documents GROUP BY source ORDER BY source""",
    tags=("llm", "profile"),
)
def profile_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental profiling via mergeable moments (operators/stats.py):
    the corpus is profiled as TWO independent ingest waves (hash-split
    halves), each reduced to per-source sufficient statistics
    (n, Σv, Σv², min, max — exact BIGINTs), then MERGED — never
    re-scanning wave 1 — and the derived mean/variance come out of
    integer formulas. The oracle computes the same stats DIRECTLY over
    the whole corpus: the driver hash therefore proves merge == direct,
    the invariant that lets a 100 TB ingest keep running profiles at
    per-batch cost."""
    from ..operators.stats import derive_stats, merge_moments, moment_stats

    docs = load_tables(spark, sf_dir, "documents").documents
    wave1 = docs.filter(F.col("doc_id") % 2 == 0)
    wave2 = docs.filter(F.col("doc_id") % 2 == 1)
    p1 = moment_stats(wave1, "n_chars", ["source"])
    p2 = moment_stats(wave2, "n_chars", ["source"])
    merged = merge_moments(p1, p2, group_cols=["source"])
    return derive_stats(merged)


@query(
    "multimodal_audio_neardup",
    oracle="""
    WITH base AS (
      SELECT doc_id, 800 + (doc_id % 5) * 160 AS n FROM documents
      WHERE doc_id < 200
    ), s AS (
      SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS i FROM base
    ), v AS (
      SELECT doc_id, n, i,
             ABS(((doc_id * 7919 + i * 104729) % 65536) - 32768) AS av
      FROM s
    ), eng AS (
      SELECT doc_id, i // (n // 32) AS f, CAST(SUM(av) AS BIGINT) AS e
      FROM v GROUP BY doc_id, i // (n // 32)
    ), bits AS (
      SELECT a.doc_id, a.f, CASE WHEN a.e > b.e THEN 1 ELSE 0 END AS bit
      FROM eng a JOIN eng b ON a.doc_id = b.doc_id AND b.f = a.f + 1
    ), hs AS (
      SELECT doc_id,
             CAST(SUM(bit * (1::BIGINT << CAST(f AS INTEGER))) AS BIGINT) AS afp
      FROM bits GROUP BY doc_id
    ), blk AS (
      SELECT doc_id, afp, b AS blk, (afp >> (b * 6)) & 63 AS bv
      FROM hs, unnest([0, 1, 2, 3, 4, 5]) AS t(b)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      a.afp AS ha, b.afp AS hb
      FROM blk a JOIN blk b
        ON a.blk = b.blk AND a.bv = b.bv AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(ha, hb)) <= 5
    ORDER BY doc_a, doc_b""",
    tags=("llm", "multimodal", "dedup"),
)
def multimodal_audio_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIO near-duplicate search through the real WAV codec: per-doc
    deterministic PCM synthesis -> RIFF/PCM-16 encode -> decode -> 31-bit
    energy-envelope gradient fingerprint
    (operators/multimodal.wav_fingerprint), then pigeonhole 6-bit-block
    pairing at hamming ≤ 5 — completing the near-dup modality family
    (MinHash text, SimHash tokens, cosine embeddings, dHash images, this
    for audio), all through the shared hamming_block_pairs engine. The
    oracle recomputes every frame energy from the synthesis rule in SQL,
    so a codec defect anywhere flips the driver hash. Bounded to the
    doc_id<200 slice (the png_roundtrip convention): the synthesis depends
    only on doc_id, so an unbounded slice just grows near-identical
    families quadratically without exercising anything new."""
    from ..operators import multimodal as M

    docs = load_tables(spark, sf_dir, "documents").documents.filter(
        F.col("doc_id") < 200
    )
    return M.audio_near_dup(M.wav_fingerprint(docs))


@query(
    "join_bloom_prefilter",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
             AS total_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING' AND c.c_acctbal > 9000
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""",
    tags=("relational", "scale"),
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered join — the explicit form of Spark's runtime
    bloom filter / Iceberg's bloom pushdown: the selective dimension
    subset (BUILDING customers with high balance) builds a packed-word
    Bloom filter (operators/bloom.py — driver state = m_bits/64 longs at
    ANY table size), the FACT side drops provably-non-matching rows
    MAP-SIDE before its shuffle (whole-stage-codegen bit tests, no join),
    and only the surviving sliver pays the real join — which also removes
    the filter's false positives, so the result is exactly the plain
    join's (what the oracle asserts). At 100 TB this is the difference
    between shuffling the whole fact table and shuffling the matching
    fraction."""
    from ..operators.bloom import bloom_build, bloom_might_contain

    t = load_tables(spark, sf_dir, "orders", "customer")
    dim = t.customer.filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 9000)
    ).select("c_custkey")
    model = bloom_build(dim, "c_custkey", m_bits=1 << 14)
    # probe column must carry the SAME TYPE as the build column — the
    # xxhash64 probes are type-sensitive (long 5 != string '5')
    fact = t.orders.filter(bloom_might_contain(model, F.col("o_custkey")))
    joined = fact.join(
        F.broadcast(dim), fact["o_custkey"] == dim["c_custkey"], "left_semi"
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
        .cast("double")
        .alias("total_price"),
    )


@query(
    "events_value_trend",
    oracle="""
    WITH b AS (
      SELECT event_type,
             epoch_us(ts) // 3600000000 AS h,
             CAST(FLOOR(value * 1000) AS BIGINT) AS ym
      FROM events
    ), c AS (
      SELECT event_type, h - MIN(h) OVER (PARTITION BY event_type) AS x, ym
      FROM b
    ), s AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(ym) AS BIGINT) AS sy,
             CAST(SUM(x * ym) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM c GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n, sx, sy, sxy, sxx,
           CAST(CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE)
                AS DOUBLE) AS slope_milli_per_hour
    FROM s ORDER BY event_type""",
    tags=("llm", "events", "stats"),
)
def events_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type OLS trend of event value over time — drift detection for a
    live metric, the regression member of the exact-stats family
    (variance/corr from exact sums): x = hour index centered per type
    (keeps every BIGINT sum far from overflow), y = milli-fixed-point
    value (float64 ``value*1000`` truncation is bit-identical on both
    engines), all five sufficient sums are EXACT BIGINTs riding one
    map-side-combined shuffle (plus one per-type min-hour window), and the
    slope is the identical double formula over them (the agg_corr_exact
    convention)."""
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, "events").events
    b = ev.select(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").alias("h"),
        F.expr("CAST(value * 1000 AS BIGINT)").alias("ym"),
    )
    w = Window.partitionBy("event_type")
    c = b.select(
        "event_type", (F.col("h") - F.min("h").over(w)).alias("x"), "ym"
    )
    n = F.count(F.lit(1))
    sx = F.sum("x").cast("long")
    sy = F.sum("ym").cast("long")
    sxy = F.sum(F.col("x") * F.col("ym")).cast("long")
    sxx = F.sum(F.col("x") * F.col("x")).cast("long")
    s = c.groupBy("event_type").agg(
        n.cast("long").alias("n"), sx.alias("sx"), sy.alias("sy"),
        sxy.alias("sxy"), sxx.alias("sxx"),
    )
    # numerator/denominator assembled as EXACT BIGINTs (bounds: |n·sxy| and
    # |sx·sy| stay ≤ ~1e17 at sf0.1 — documented, ANSI-pinned; the
    # double-product variant had the FMA-fusion hazard: DuckDB can fuse
    # a·b − c·d into one rounding, the JVM never does)
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ).cast("double")
    return s.select(
        "event_type", "n", "sx", "sy", "sxy", "sxx",
        slope.alias("slope_milli_per_hour"),
    )


def _sq8_oracle() -> str:
    import os

    from ..operators.embedding import sq8_fit_np
    from ..operators.text import BASE, MOD
    from .llm_ops import ORACLE_SF_DIR

    mins, scales = sq8_fit_np(os.path.join(ORACLE_SF_DIR, "embeddings.parquet"))

    def dlist(v):
        # element-wise ::DOUBLE — a bare 64-element decimal-literal list
        # would first take a COMMON DECIMAL type (losing ulps) before any
        # outer CAST(.. AS DOUBLE[]) could run
        return "[" + ", ".join(f"{float(x)!r}::DOUBLE" for x in v) + "]"

    idx = "[" + ", ".join(str(i) for i in range(1, 65)) + "]"
    code = (
        "LEAST(255, GREATEST(0, CAST(FLOOR((CAST(embedding[i] AS DOUBLE)"
        f" - mn[i]) * sc[i] + 1e-9) AS BIGINT)))"
    )
    return f"""
    WITH m AS (
      SELECT {dlist(mins)} AS mn, {dlist(scales)} AS sc
    ), c AS (
      SELECT vec_id,
             list_transform({idx}, i -> {code}) AS codes
      FROM embeddings, m
    )
    SELECT vec_id,
           CAST(list_reduce(codes, (a, b) -> a + b) AS BIGINT) AS code_sum,
           CAST(list_min(codes) AS BIGINT) AS code_min,
           CAST(list_max(codes) AS BIGINT) AS code_max,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), codes),
                (a, b) -> (a * {BASE} + b) % {MOD}) AS BIGINT) AS code_hash
    FROM c ORDER BY vec_id"""


@query("embedding_quantize_sq8", oracle=_sq8_oracle(), tags=("llm", "embedding"))
def embedding_quantize_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-bit scalar quantization of the embedding column (the FAISS-SQ8
    storage path, completing the vector-compression family next to the PQ
    codebooks and IVF cells): per-dim (min, scale) fitted ONCE on the gate
    corpus (train-once-apply-at-any-sf), codes = clamp(floor((x-mn)*s))
    as a pure JVM projection — zero Python, zero shuffle, 4x smaller
    at-rest vectors. The driver hash checks the code arrays themselves
    via the polynomial fold; float32 -> double casts are exact, so both
    engines compute bit-identical codes."""
    import os

    from ..operators.embedding import sq8_encode, sq8_fit_np
    from .llm_ops import ORACLE_SF_DIR
    from ..operators.text import BASE, MOD

    mins, scales = sq8_fit_np(os.path.join(ORACLE_SF_DIR, "embeddings.parquet"))
    emb = load_tables(spark, sf_dir, "embeddings").embeddings
    codes = sq8_encode(emb, mins, scales)
    withc = emb.select("vec_id", codes.alias("codes"))
    return withc.select(
        "vec_id",
        F.aggregate("codes", F.lit(0).cast("long"), lambda a, c: a + c)
        .cast("long")
        .alias("code_sum"),
        F.array_min("codes").cast("long").alias("code_min"),
        F.array_max("codes").cast("long").alias("code_max"),
        F.aggregate(
            "codes",
            F.lit(0).cast("long"),
            lambda a, c: (a * BASE + c) % MOD,
        )
        .cast("long")
        .alias("code_hash"),
    )


@query(
    "dedup_crossmodal_agreement",
    oracle=f"""
    WITH txt AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM documents a JOIN documents b
        ON a.doc_id < b.doc_id AND md5(a.text) = md5(b.text)
    ), img AS (
      SELECT doc_a, doc_b FROM ({_dhash_oracle()})
    )
    SELECT COALESCE(t.doc_a, i.doc_a) AS doc_a,
           COALESCE(t.doc_b, i.doc_b) AS doc_b,
           CASE WHEN t.doc_a IS NOT NULL AND i.doc_a IS NOT NULL THEN 'both'
                WHEN i.doc_a IS NOT NULL THEN 'image_only'
                ELSE 'text_only' END AS agreement
    FROM txt t FULL OUTER JOIN img i
      ON t.doc_a = i.doc_a AND t.doc_b = i.doc_b
    ORDER BY doc_a, doc_b""",
    tags=("llm", "multimodal", "dedup"),
)
def dedup_crossmodal_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal dedup consistency — which near-dup pairs do the TEXT
    and IMAGE modalities agree on: exact-text pairs (md5 equality) full-
    outer-joined with the perceptual dHash pairs. Because every image is
    synthesized from its text, identical text ⇒ identical image ⇒
    hamming 0, so 'text_only' rows are IMPOSSIBLE unless something in the
    synthesize/resize/decode/hash chain breaks determinism — the driver
    hash checks that invariant corpus-wide, plus the image-only fuzzy
    matches the text modality cannot see."""
    from ..operators import multimodal as M

    docs = load_tables(spark, sf_dir, "documents").documents
    fp = docs.select("doc_id", F.md5("text").alias("fp"))
    a = fp.select(F.col("doc_id").alias("doc_a"), "fp")
    b = fp.select(F.col("doc_id").alias("doc_b"), "fp")
    txt = (
        a.join(b, "fp").filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )
    img = M.dhash_near_dup(
        M.dhash_synth_resized(
            docs, synth_width=18, synth_height=14, width=9, height=7
        )
    ).select("doc_a", "doc_b")
    agreement = (
        F.when(txt["doc_a"].isNotNull() & img["doc_a"].isNotNull(), "both")
        .when(img["doc_a"].isNotNull(), "image_only")
        .otherwise("text_only")
    )
    return (
        txt.join(
            img,
            (txt["doc_a"] == img["doc_a"]) & (txt["doc_b"] == img["doc_b"]),
            "full_outer",
        )
        .select(
            F.coalesce(txt["doc_a"], img["doc_a"]).alias("doc_a"),
            F.coalesce(txt["doc_b"], img["doc_b"]).alias("doc_b"),
            agreement.alias("agreement"),
        )
    )


@query(
    "join_point_in_time",
    oracle="""
    WITH dim AS (
      SELECT c_custkey, v,
             CASE v WHEN 1 THEN DATE '1990-01-01'
                    WHEN 2 THEN DATE '1997-01-01' + CAST(c_custkey % 365 AS INTEGER)
                    ELSE DATE '1999-01-01' + CAST((c_custkey * 7) % 365 AS INTEGER)
             END AS valid_from,
             CASE v WHEN 1 THEN DATE '1997-01-01' + CAST(c_custkey % 365 AS INTEGER)
                    WHEN 2 THEN DATE '1999-01-01' + CAST((c_custkey * 7) % 365 AS INTEGER)
                    ELSE DATE '2005-01-01'
             END AS valid_to
      FROM customer, unnest([1, 2, 3]) AS t(v)
    )
    SELECT d.v AS version,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
             AS total_price
    FROM orders o
    JOIN dim d ON o.o_custkey = d.c_custkey
      AND CAST(o.o_orderdate AS DATE) >= d.valid_from
      AND CAST(o.o_orderdate AS DATE) < d.valid_to
    GROUP BY d.v ORDER BY version""",
    tags=("relational", "temporal"),
)
def join_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (SCD2) enrichment — the feature-store join that
    prevents temporal leakage in training data: every order joins the
    dimension VERSION that was valid at its order date, never a later
    one. The versioned dimension is synthesized deterministically from
    customer (3 validity windows with per-customer boundaries); the join
    is custkey-equi + validity-range filter, so per-key fan-out is
    bounded by the version count (never a range-only nested loop), and
    exactly one version matches each order by construction — an
    every-order-joins-once invariant the totals expose."""
    t = load_tables(spark, sf_dir, "orders", "customer")
    v = F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("v")
    b1 = F.expr("date_add(DATE'1997-01-01', CAST(c_custkey % 365 AS INT))")
    b2 = F.expr("date_add(DATE'1999-01-01', CAST((c_custkey * 7) % 365 AS INT))")
    dim = t.customer.select("c_custkey", v).select(
        "c_custkey",
        "v",
        F.when(F.col("v") == 1, F.lit("1990-01-01").cast("date"))
        .when(F.col("v") == 2, b1)
        .otherwise(b2)
        .alias("valid_from"),
        F.when(F.col("v") == 1, b1)
        .when(F.col("v") == 2, b2)
        .otherwise(F.lit("2005-01-01").cast("date"))
        .alias("valid_to"),
    )
    od = F.col("o_orderdate").cast("date")
    joined = t.orders.join(
        dim,
        (F.col("o_custkey") == F.col("c_custkey"))
        & (od >= F.col("valid_from"))
        & (od < F.col("valid_to")),
    )
    return (
        joined.groupBy(F.col("v").alias("version"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.countDistinct("o_custkey").cast("long").alias("n_customers"),
            F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("version")
    )
