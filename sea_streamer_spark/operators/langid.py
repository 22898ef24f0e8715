"""Character-n-gram language identification (Cavnar & Trenkle 1994,
"N-Gram-Based Text Categorization").

Upgrade path over ``operators/text.language_id``'s stopword-marker
heuristic (the reference has no language tooling at all — this is part of
the beyond-reference LLM-curation layer, like DSIR/BPE/quality): each
language is represented by the RANK order of its most frequent character
trigrams, and a document is classified by the out-of-place rank distance
between its own trigram ranking and each profile. Everything after
normalization is INTEGER arithmetic (counts, ranks, |rank-rank| sums), so
the full classifier replays bit-for-bit in SQL and the driver's value hash
checks real predictions, not a golden.

Profiles are trained at import from fixed public-domain-style seed
paragraphs embedded below (NOT from the driver corpus: its ``lang`` labels
are decorrelated from the text, which is an English token soup for every
label — training there would be fitting noise). Seed text is module
source, so the model is identical on every engine and at every scale
factor: train-once-apply-at-any-sf, the whiten/DSIR/BPE convention.

Scale shape: one explode keyed by doc (rows ≈ characters, the same volume
every shingle op in this repo handles), one (doc, gram) count shuffle, one
doc-keyed window for the per-doc ranking, a BROADCAST join against the
≤ languages × PROFILE_K literal profile relation, and one doc-keyed final
aggregation. Nothing scales super-linearly with corpus size; the profile
table is a few KiB at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Trigrams kept per language profile (Cavnar-Trenkle use 300).
PROFILE_K = 300
#: Trigrams kept per document profile. C&T keep the doc profile shorter
#: than the language profile; 120 covers short documents fully.
DOC_K = 120
#: Out-of-place penalty for a doc trigram absent from a language profile.
MISS_PENALTY = PROFILE_K

#: Seed text per language: ordinary prose, function-word rich (function
#: words and affixes dominate top trigram ranks, which is why the method
#: works on ~300-gram profiles). Latin-alphabet languages only — the
#: normalizer folds to [a-z ], keeping the Spark and DuckDB sides
#: byte-identical without locale-sensitive case or unicode-range regexes.
SEED_TEXT: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog and then it runs "
        "into the forest where the trees are tall and the light is dim "
        "this is the house that jack built and these are the people who "
        "live in the house that jack built they said that they would "
        "come to the market in the morning with the things that we had "
        "asked for and that the weather would be fine for the journey "
        "it was the best of times it was the worst of times it was the "
        "age of wisdom it was the age of foolishness we were all going "
        "direct to heaven we were all going direct the other way and "
        "there was nothing that could be done about it at all"
    ),
    "de": (
        "der schnelle braune fuchs springt ueber den faulen hund und "
        "laeuft dann in den wald wo die baeume hoch sind und das licht "
        "schwach ist dies ist das haus das jakob gebaut hat und das "
        "sind die leute die in dem haus wohnen sie sagten dass sie am "
        "morgen mit den sachen die wir verlangt hatten zum markt kommen "
        "wuerden und dass das wetter fuer die reise schoen sein wuerde "
        "es war die beste zeit es war die schlechteste zeit es war das "
        "zeitalter der weisheit es war das zeitalter der torheit wir "
        "gingen alle geradewegs in den himmel wir gingen alle in die "
        "andere richtung und niemand konnte etwas dagegen tun"
    ),
    "es": (
        "el rapido zorro marron salta sobre el perro perezoso y luego "
        "corre hacia el bosque donde los arboles son altos y la luz es "
        "tenue esta es la casa que construyo juan y esta es la gente "
        "que vive en la casa dijeron que vendrian al mercado por la "
        "manana con las cosas que habiamos pedido y que el tiempo seria "
        "bueno para el viaje era el mejor de los tiempos era el peor de "
        "los tiempos era la edad de la sabiduria era la edad de la "
        "locura ibamos todos directos al cielo ibamos todos en la otra "
        "direccion y no habia nada que se pudiera hacer al respecto"
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux puis "
        "il court dans la foret ou les arbres sont hauts et la lumiere "
        "est faible voici la maison que jacques a construite et voici "
        "les gens qui vivent dans la maison ils ont dit qu ils "
        "viendraient au marche le matin avec les choses que nous avions "
        "demandees et que le temps serait beau pour le voyage c etait "
        "le meilleur des temps c etait le pire des temps c etait l age "
        "de la sagesse c etait l age de la folie nous allions tous "
        "droit au ciel nous allions tous dans l autre direction et il n "
        "y avait rien a faire a ce sujet"
    ),
    "it": (
        "la rapida volpe marrone salta sopra il cane pigro e poi corre "
        "nella foresta dove gli alberi sono alti e la luce e debole "
        "questa e la casa che giacomo ha costruito e queste sono le "
        "persone che vivono nella casa hanno detto che sarebbero venuti "
        "al mercato la mattina con le cose che avevamo chiesto e che il "
        "tempo sarebbe stato bello per il viaggio era il migliore dei "
        "tempi era il peggiore dei tempi era l eta della saggezza era l "
        "eta della follia andavamo tutti dritti al cielo andavamo tutti "
        "nell altra direzione e non c era niente da fare al riguardo"
    ),
    "pt": (
        "a rapida raposa marrom pula sobre o cachorro preguicoso e "
        "depois corre para a floresta onde as arvores sao altas e a luz "
        "e fraca esta e a casa que joao construiu e estas sao as "
        "pessoas que moram na casa disseram que viriam ao mercado de "
        "manha com as coisas que tinhamos pedido e que o tempo estaria "
        "bom para a viagem era o melhor dos tempos era o pior dos "
        "tempos era a idade da sabedoria era a idade da loucura iamos "
        "todos direto para o ceu iamos todos na outra direcao e nao "
        "havia nada que se pudesse fazer a respeito"
    ),
}

LANGS: tuple[str, ...] = tuple(sorted(SEED_TEXT))


def normalize_py(text: str) -> str:
    """Pure-python mirror of ``normalize_expr`` (shared by profile
    training and the test reference)."""
    import re

    return re.sub(r"[^a-z]+", " ", text.lower()).strip()


def normalize_expr(col: Column) -> Column:
    """lower → non-[a-z] runs to one space → trim. Matches ``normalize_py``
    and the DuckDB oracle's ``regexp_replace(lower(..), '[^a-z]+', ' ', 'g')``."""
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z]+", " "))


def trigrams_py(norm: str) -> list[str]:
    return [norm[i : i + 3] for i in range(len(norm) - 2)]


def train_profile_py(text: str, k: int = PROFILE_K) -> dict[str, int]:
    """Top-k trigram → rank (1-based). Ties broken by trigram text — the
    same (count DESC, gram ASC) total order used on the engine sides."""
    from collections import Counter

    counts = Counter(trigrams_py(normalize_py(text)))
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return {g: i + 1 for i, (g, _) in enumerate(ranked)}


#: language → {trigram: rank}, built once at import (pure python, ~ms).
PROFILES: dict[str, dict[str, int]] = {
    lang: train_profile_py(text) for lang, text in SEED_TEXT.items()
}


def profile_rows() -> list[tuple]:
    """(gram, rank_en, rank_de, ...) rows — MISS_PENALTY where absent.
    One row per gram appearing in ANY profile; the literal relation both
    engines join against."""
    grams = sorted({g for p in PROFILES.values() for g in p})
    return [
        tuple([g] + [PROFILES[lang].get(g, MISS_PENALTY) for lang in LANGS])
        for g in grams
    ]


def lang_id_ngram(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Classify every document: out-of-place distance to each language
    profile + argmin prediction (deterministic tie-break by language code).

    Output: (id, dist_<lang>... BIGINT, pred_lang). A document whose
    normalized text yields no trigram (e.g. all digits) gets the pure
    miss-mass distance DOC_K*MISS_PENALTY for every language? No — it has
    zero profile rows, so every distance is 0; it is flagged with
    pred_lang='unknown' instead of a fake argmin.
    """
    spark = df.sparkSession
    norm = normalize_expr(F.col(text_col))
    # repartition by doc BEFORE the explode: the generate multiplies
    # volume ~|doc| per row, so input-BYTES-based scan partitioning
    # undercounts by orders of magnitude (a small parquet arrives as one
    # task and the whole corpus trigram count runs single-threaded).
    # Hash-partitioning on _id also makes everything downstream
    # exchange-free: HashPartitioning(_id) satisfies the (_id, gram)
    # groupBy's clustered distribution, the per-doc rank window, and the
    # final per-doc distance aggregate — the raw-docs shuffle (pre-explode
    # bytes, the SMALLEST relation in the pipeline) is the only exchange
    # in the operator. fan_out pins an explicit partition count (AQE
    # coalesces by SHUFFLE bytes and would fold the small pre-explode
    # relation back to one partition, serializing the ~|doc|× larger
    # generate+aggregate downstream) and no-ops at production scale where
    # the scan already has more splits than cores.
    from .scale import fan_out

    base_raw = df.select(F.col(id_col).alias("_id"), norm.alias("_norm"))
    base = fan_out(base_raw, key="_id")
    # one row per trigram position (explode keyed by doc). The length
    # guard matters: Spark's sequence(1, n) with n < 1 generates a
    # DESCENDING sequence, not an empty one.
    tri = (
        base.filter(F.length("_norm") >= 3)
        .select(
            "_id",
            F.explode(F.sequence(F.lit(1), F.length("_norm") - 2)).alias("_i"),
            "_norm",
        )
        .select("_id", F.substring(F.col("_norm"), F.col("_i"), 3).alias("gram"))
    )
    counts = tri.groupBy("_id", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    from pyspark.sql import Window

    w = Window.partitionBy("_id").orderBy(F.col("cnt").desc(), F.col("gram"))
    doc_prof = (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= DOC_K)
        .select("_id", "gram", "rk")
    )
    prof = spark.createDataFrame(
        profile_rows(), ["gram"] + [f"rank_{lang}" for lang in LANGS]
    )
    joined = doc_prof.join(F.broadcast(prof), "gram", "left")
    dist_cols = [
        F.sum(
            F.abs(
                F.col("rk")
                - F.coalesce(F.col(f"rank_{lang}"), F.lit(MISS_PENALTY))
            )
        )
        .cast("long")
        .alias(f"dist_{lang}")
        for lang in LANGS
    ]
    dists = joined.groupBy("_id").agg(*dist_cols)
    pred = F.lit(LANGS[0])
    best = F.col(f"dist_{LANGS[0]}")
    for lang in LANGS[1:]:
        d = F.col(f"dist_{lang}")
        pred = F.when(d < best, F.lit(lang)).otherwise(pred)
        best = F.when(d < best, d).otherwise(best)
    scored = dists.select(
        F.col("_id").alias(id_col),
        *[F.col(f"dist_{lang}") for lang in LANGS],
        pred.alias("pred_lang"),
    )
    # docs with no trigram at all (normalized text shorter than 3 chars)
    # drop out of the explode — reattach them as 'unknown' with all-zero
    # distances so the operator is total over its input. scored holds
    # exactly the length>=3 docs, so the complement is the same length
    # predicate (a plain filter — NOT an anti join, which would recompute
    # the whole scoring pipeline as its probe side).
    # off base_raw, not base: a plain filtered scan needs no distribution,
    # so routing it through the repartition would add a shuffle for nothing
    missing = base_raw.filter(F.length("_norm") < 3).select(
        F.col("_id").alias(id_col),
        *[F.lit(0).cast("long").alias(f"dist_{lang}") for lang in LANGS],
        F.lit("unknown").alias("pred_lang"),
    )
    return scored.unionByName(missing)


def classify_py(text: str) -> str:
    """Pure-python reference classifier (tests pin Spark == this)."""
    from collections import Counter

    norm = normalize_py(text)
    counts = Counter(trigrams_py(norm))
    if not counts:
        return "unknown"
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:DOC_K]
    best_lang, best_d = None, None
    for lang in LANGS:
        prof = PROFILES[lang]
        d = sum(
            abs((i + 1) - prof.get(g, MISS_PENALTY))
            for i, (g, _) in enumerate(ranked)
        )
        if best_d is None or d < best_d:
            best_lang, best_d = lang, d
    return best_lang
