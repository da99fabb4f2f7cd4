"""Text-analysis operators for training-data pipelines.

Language-ID (stopword heuristic), quality scoring, token counting,
document fingerprinting — all pure Spark built-ins (JVM-side,
whole-stage codegen) with integer-scaled arithmetic so the DuckDB
oracle reproduces results exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists (public common words); order of
# LANGS is the deterministic tie-break order for language_id
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "a", "that"],
    "de": ["der", "die", "und", "das", "ist", "ein", "nicht", "mit"],
    "es": ["el", "la", "los", "que", "y", "es", "una", "para"],
    "fr": ["le", "la", "les", "et", "est", "une", "pour", "dans"],
    "zh": ["de", "shi", "le", "zai", "you", "wo", "ta", "men"],
}
LANGS = list(STOPWORDS)


def tokens_col(text_col: str) -> Column:
    return F.split(F.lower(F.col(text_col)), r"\s+")


def with_token_count(df: DataFrame, text_col: str = "text",
                     out: str = "n_tokens") -> DataFrame:
    return df.withColumn(out, F.size(tokens_col(text_col)))


def with_fingerprint(df: DataFrame, text_col: str = "text",
                     out: str = "fingerprint") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase
    text (portable to any engine with md5)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))),
                            r"\s+", " ")
    return df.withColumn(out, F.md5(norm))


def _stopword_hits(toks: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


# ---------------------------------------------------------------------------
# Language-ID: character-trigram profiles (Cavnar-Trenkle style)
# ---------------------------------------------------------------------------
# Seed paragraphs are self-composed sentences dense in each language's
# function words (deterministic, license-free; no external data).
# Char trigrams work on whitespace-free scripts (zh/ja/ko) where the
# old stopword heuristic structurally could not.

TRIGRAM_SEEDS = {
    "en": ("the quick brown fox jumps over the lazy dog. this is the "
           "house that we have seen and it was not there when they "
           "came from the city with their friends. what do you think "
           "about the people who said that there would be more time "
           "for all of these things in the morning. i have a question "
           "and an answer for you and for them."),
    "de": ("der schnelle braune fuchs springt über den faulen hund. "
           "das ist das haus das wir gesehen haben und es war nicht "
           "da als sie mit ihren freunden aus der stadt kamen. was "
           "denkst du über die leute die gesagt haben dass es morgen "
           "mehr zeit für alle diese dinge geben würde. ich habe eine "
           "frage und eine antwort für dich und für sie."),
    "es": ("el rápido zorro marrón salta sobre el perro perezoso. "
           "esta es la casa que hemos visto y no estaba allí cuando "
           "vinieron de la ciudad con sus amigos. qué piensas de la "
           "gente que dijo que habría más tiempo para todas estas "
           "cosas por la mañana. tengo una pregunta y una respuesta "
           "para ti y para ellos."),
    "fr": ("le rapide renard brun saute par dessus le chien "
           "paresseux. c'est la maison que nous avons vue et elle "
           "n'était pas là quand ils sont venus de la ville avec "
           "leurs amis. que pensez vous des gens qui ont dit qu'il y "
           "aurait plus de temps pour toutes ces choses le matin. "
           "j'ai une question et une réponse pour toi et pour eux."),
    "pt": ("a rápida raposa marrom salta sobre o cão preguiçoso. "
           "esta é a casa que vimos e não estava lá quando eles "
           "vieram da cidade com os seus amigos. o que você acha das "
           "pessoas que disseram que haveria mais tempo para todas "
           "essas coisas pela manhã. eu tenho uma pergunta e uma "
           "resposta para você e para eles."),
    "it": ("la veloce volpe marrone salta sopra il cane pigro. "
           "questa è la casa che abbiamo visto e non era lì quando "
           "sono venuti dalla città con i loro amici. cosa pensi "
           "delle persone che hanno detto che ci sarebbe stato più "
           "tempo per tutte queste cose al mattino. ho una domanda e "
           "una risposta per te e per loro."),
    "ru": ("быстрая коричневая лиса прыгает через ленивую собаку. "
           "это дом который мы видели и его не было там когда они "
           "приехали из города со своими друзьями. что ты думаешь о "
           "людях которые сказали что утром будет больше времени для "
           "всех этих дел. у меня есть вопрос и ответ для тебя и для "
           "них."),
    "zh": ("敏捷的棕色狐狸跳过了懒惰的狗。这是我们看到的那座房子,"
           "他们和朋友从城里来的时候它不在那里。你觉得那些说早上会"
           "有更多时间做这些事情的人怎么样。我有一个问题和一个答案"
           "要告诉你。我们的时间不多了,因为他们已经到了。"),
    "ja": ("すばやい茶色の狐はなまけものの犬を飛び越えます。これは"
           "私たちが見た家で、彼らが友達と町から来たときそこには"
           "ありませんでした。朝にはこれらのことをするための時間が"
           "もっとあると言った人たちについてどう思いますか。私は"
           "あなたに質問と答えがあります。"),
    "ko": ("빠른 갈색 여우가 게으른 개를 뛰어넘는다. 이것은 우리가 "
           "본 집이고 그들이 친구들과 도시에서 왔을 때 거기에 "
           "없었다. 아침에 이 모든 일을 할 시간이 더 있을 거라고 "
           "말한 사람들에 대해 어떻게 생각하니. 나는 너에게 질문과 "
           "대답이 있다."),
}
TRIGRAM_LANGS = list(TRIGRAM_SEEDS)       # tie-break priority order
PROFILE_SIZE = 200


def trigram_profiles(k: int = PROFILE_SIZE) -> dict[str,
                                                    dict[str, int]]:
    """Per-language {trigram: integer weight}: the top-k trigrams of
    the padded, whitespace-collapsed, lowercased seed, weighted
    k-rank (rank by count desc, trigram asc — fully deterministic).
    Identical tables are embedded in the Spark profile DataFrame and
    the DuckDB oracle VALUES list."""
    import re

    out = {}
    for lang, seed in TRIGRAM_SEEDS.items():
        norm = " " + re.sub(r"\s+", " ", seed.lower()).strip() + " "
        counts: dict[str, int] = {}
        for i in range(len(norm) - 2):
            t = norm[i:i + 3]
            counts[t] = counts.get(t, 0) + 1
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[lang] = {t: k - i for i, (t, _) in enumerate(top)}
    return out


def _padded_col(text_col: str) -> Column:
    norm = F.regexp_replace(F.lower(F.coalesce(F.col(text_col),
                                               F.lit(""))),
                            r"\s+", " ")
    return F.concat(F.lit(" "), norm, F.lit(" "))


def language_id_kernel(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       out: str = "lang_pred") -> DataFrame:
    """Arrow-batched language-ID kernel: the same trigram profiles,
    integer scores, and (score desc, lang order) tie-break as the
    relational path — bit-identical predictions — but zero shuffle
    and no 100x trigram-row explode: one combined {trigram: weight
    vector} dict per worker, one pass over each document's chars.
    Returns (id_col, out); use ``with_language_id`` when the
    prediction must be appended to an existing row set.

    Whitespace collapse uses the ASCII class [ \\t\\n\\x0b\\f\\r]
    — exactly Java regex / RE2 ``\\s`` — so the three engines
    (kernel, Spark SQL, DuckDB) normalize identically."""
    import re as _re

    import pandas as _pd
    from pyspark.sql.types import StringType, StructField, StructType

    profs = trigram_profiles()
    langs = TRIGRAM_LANGS
    n = len(langs)
    combined: dict[str, list[int]] = {}
    for li, lang in enumerate(langs):
        for tri, w in profs[lang].items():
            combined.setdefault(tri, [0] * n)[li] = w
    ws = _re.compile(r"[ \t\n\x0b\f\r]+")
    out_schema = StructType([
        StructField(id_col, df.schema[id_col].dataType, True),
        StructField(out, StringType(), True),
    ])

    def batches(it):
        get = combined.get
        for pdf in it:
            ids, preds = [], []
            for rid, text in zip(pdf[id_col].values,
                                 pdf[text_col].values):
                p = " " + ws.sub(" ", (text or "").lower()) + " "
                scores = [0] * n
                for i in range(len(p) - 2):
                    v = get(p[i:i + 3])
                    if v is not None:
                        for j in range(n):
                            scores[j] += v[j]
                best = max(scores)
                preds.append(langs[scores.index(best)]
                             if best > 0 else "unknown")
                ids.append(rid)
            yield _pd.DataFrame({id_col: ids, out: preds})

    return df.select(id_col, text_col).mapInPandas(batches,
                                                   out_schema)


def with_language_id(df: DataFrame, text_col: str = "text",
                     out: str = "lang_pred",
                     id_col: str = "doc_id") -> DataFrame:
    """Character-trigram language-ID (Cavnar-Trenkle out-of-place
    profiles, integer-scaled): every doc trigram occurrence scores
    its language-profile weight; argmax wins, tie-broken by
    TRIGRAM_LANGS order; all-zero scores -> 'unknown'.

    Relational scale path: explode trigrams -> broadcast equi-join
    against the ~2k-row profile table -> map-side partial sum per
    (doc, lang) -> window argmax -> join back on ``id_col``.  No
    Python in the hot path and no giant literal expressions; the
    profile join broadcasts a few KB.  Handles zh/ja/ko (no
    whitespace tokens) because trigrams are character-level."""
    from pyspark.sql import Window

    spark = df.sparkSession
    profs = trigram_profiles()
    prof_rows = [(lang, rank, tri, w)
                 for rank, lang in enumerate(TRIGRAM_LANGS)
                 for tri, w in profs[lang].items()]
    prof = F.broadcast(spark.createDataFrame(
        prof_rows, "lang string, lang_rank int, tri string, w int"))

    padded = df.select(F.col(id_col), _padded_col(text_col)
                       .alias("_pad"))
    tri_arr = F.expr(
        "CASE WHEN length(_pad) >= 3 THEN "
        "transform(sequence(1, length(_pad) - 2), "
        "i -> substring(_pad, i, 3)) "
        "ELSE CAST(array() AS array<string>) END")
    tris = padded.select(id_col, F.explode(tri_arr).alias("tri"))
    scores = (tris.join(prof, "tri")
              .groupBy(id_col, "lang", "lang_rank")
              .agg(F.sum("w").alias("score")))
    w_best = (Window.partitionBy(id_col)
              .orderBy(F.col("score").desc(), F.col("lang_rank").asc()))
    best = (scores.filter(F.col("score") > 0)
            .withColumn("_rn", F.row_number().over(w_best))
            .filter(F.col("_rn") == 1)
            .select(F.col(id_col).alias("_lid"),
                    F.col("lang").alias("_lang")))
    return (df.join(best, df[id_col] == best["_lid"], "left")
            .withColumn(out, F.coalesce("_lang", F.lit("unknown")))
            .drop("_lid", "_lang"))


# BPE-ish pre-tokenization pattern (GPT-2 style, lookahead-free so
# both Java regex and RE2/DuckDB agree): a token is an optional
# leading space plus a run of letters, digits, or other non-space
# symbols.  Counting these approximates subword-tokenizer token
# counts far better than whitespace splitting on punctuation-dense
# web text.
BPE_TOKEN_RE = r" ?\p{L}+| ?\p{N}+| ?[^\p{L}\p{N} ]+"


def with_bpe_token_count(df: DataFrame, text_col: str = "text",
                         out: str = "n_bpe_tokens") -> DataFrame:
    """Token count under the BPE-ish pre-tokenizer regex — one
    JVM-side regexp_extract_all, no Python."""
    toks = F.regexp_extract_all(
        F.regexp_replace(F.col(text_col), r"\s+", " "),
        F.lit(BPE_TOKEN_RE), 0)
    return df.withColumn(out, F.size(toks))


def with_quality_score(df: DataFrame, text_col: str = "text",
                       prefix: str = "q_") -> DataFrame:
    """Quality features, integer-scaled (per-mille) so every engine
    computes identical values:

    * ``q_n_chars`` / ``q_n_tokens``
    * ``q_mean_token_len_pm``  — 1000 * chars-in-tokens / tokens
    * ``q_stopword_pm``        — 1000 * english-stopword hits / tokens
    * ``q_alpha_pm``           — 1000 * [a-z] chars / chars
    * ``q_score_pm``           — composite gate used for filtering
    """
    toks = tokens_col(text_col)
    n_chars = F.length(F.col(text_col)).cast("bigint")
    n_tokens = F.size(toks).cast("bigint")
    tok_chars = F.aggregate(toks, F.lit(0).cast("bigint"),
                            lambda acc, t: acc + F.length(t))
    stop_hits = _stopword_hits(toks, STOPWORDS["en"]).cast("bigint")
    alpha = F.length(F.regexp_replace(F.lower(F.col(text_col)),
                                      "[^a-z]", "")).cast("bigint")
    # floor() is mirrored in the oracle SQL (DuckDB CAST rounds, so
    # an explicit floor keeps both engines identical)
    pm = lambda num, den: F.floor(  # noqa: E731
        (num * 1000) / F.greatest(den, F.lit(1))).cast("bigint")
    out = (df.withColumn(prefix + "n_chars", n_chars)
             .withColumn(prefix + "n_tokens", n_tokens)
             .withColumn(prefix + "mean_token_len_pm",
                         pm(tok_chars, n_tokens))
             .withColumn(prefix + "stopword_pm", pm(stop_hits, n_tokens))
             .withColumn(prefix + "alpha_pm", pm(alpha, n_chars)))
    score = (F.col(prefix + "alpha_pm")
             + F.col(prefix + "stopword_pm")
             + F.least(F.col(prefix + "n_tokens"), F.lit(100)) * 10)
    return out.withColumn(prefix + "score_pm", score.cast("bigint"))
