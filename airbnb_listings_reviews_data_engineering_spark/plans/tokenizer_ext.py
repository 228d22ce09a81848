"""Unigram-LM tokenizer training (SentencePiece-style hard EM).

The BPE family (iterative_ext.text_bpe_*) trains the MERGE-based
tokenizer; this module trains the other production tokenizer: a unigram
language model over subword pieces (Kudo, ACL 2018), simplified to
hard EM — E-step segments every distinct word by Viterbi under the
current piece logprobs, M-step re-estimates logprobs from the chosen
pieces' counts. Both steps are pure column arithmetic:

- The corpus collapses to the DISTINCT word table weighted by count
  (Heaps-bounded however big the corpus — the same reduction the BPE
  trainer uses), so EM cost is iterations x one word-table pass.
- The Viterbi DP runs as ONE runtime ``aggregate`` fold over the
  <= 12 word positions (the dyadic-descent discipline), with piece
  logprobs read from ONE broadcast map row; the DuckDB oracle unrolls
  the same arithmetic as chained CTEs (materialized — no collapse).
- Scores are ln-quantized to BIGINT (round(ln(p) * 1e6)) so every
  comparison is integer and the chosen segmentation is bitwise equal
  cross-engine (the ml_logreg_gd determinism discipline).

Reference parity note: the reference repo has no tokenizer surface;
this is extension surface for the 100 TB training-data catalog
(SURVEY.md "text analysis" north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checkpoint import pin
from .registry import load, register

_ULM_MAXLEN = 12      # words longer than this are dropped (doc'd cap)
_ULM_MAXP = 3         # max piece length
_ULM_SEED_MIN = 3     # min corpus freq for a len>=2 seed piece
_ULM_SEED_CAP = 192   # top len>=2 seed pieces kept
_ULM_ITERS = 2        # unrolled hard-EM rounds
_ULM_TOPK = 48        # emitted vocab rows
_ULM_NEG = -(10 ** 15)    # unknown-piece logprob (quantized)
_ULM_NEG2 = -(4 * 10 ** 16)  # invalid DP candidate (i < piece length)

# dialect fragments: {lk} piece-logprob lookup, {app} list append,
# {arr0} empty string-array literal
_ULM_SPARK = dict(
    lk="coalesce(element_at(m, {key}), CAST({neg} AS BIGINT))",
    app="concat({lst}, array({x}))",
    arr0="CAST(array() AS array<string>)",
)
_ULM_DUCK = dict(
    lk="COALESCE(map_extract(m, {key})[1], CAST({neg} AS BIGINT))",
    app="{lst} || [{x}]",
    arr0="CAST([] AS VARCHAR[])",
)


def _qln(f_expr: str, t_expr: str) -> str:
    """Quantized log-probability: round(ln(f/T) * 1e6) as BIGINT —
    identical text in both dialects (ln bitwise cross-engine per the
    text_bigram_logprob precedent; the round boundary is measure-zero
    and both engines round half away from zero)."""
    return (
        f"CAST(round(ln(CAST({f_expr} AS DOUBLE) / {t_expr}) * 1000000)"
        " AS BIGINT)"
    )


def _dp_steps(d: dict) -> list[str]:
    """The Viterbi chain as per-step select-list suffixes: for each
    position i, first the three candidate scores (piece lengths 3/2/1
    ending at i), then the max + argmax with LONGER-piece tie-break.
    Starts from b0 = 0; words shorter than i produce out-of-range
    substr lookups that miss the map and stay on the NEG floor —
    harmless because the traceback never visits positions beyond the
    word length."""
    lk = d["lk"]
    steps = []
    for i in range(1, _ULM_MAXLEN + 1):
        c1 = "b%d + %s" % (
            i - 1,
            lk.format(key=f"substr(w, {i}, 1)", neg=_ULM_NEG),
        )
        c2 = (
            "b%d + %s" % (
                i - 2,
                lk.format(key=f"substr(w, {i - 1}, 2)", neg=_ULM_NEG),
            )
            if i >= 2
            else f"CAST({_ULM_NEG2} AS BIGINT)"
        )
        c3 = (
            "b%d + %s" % (
                i - 3,
                lk.format(key=f"substr(w, {i - 2}, 3)", neg=_ULM_NEG),
            )
            if i >= 3
            else f"CAST({_ULM_NEG2} AS BIGINT)"
        )
        steps.append(f"{c1} AS c1_{i}, {c2} AS c2_{i}, {c3} AS c3_{i}")
        steps.append(
            f"CASE WHEN c3_{i} >= c2_{i} AND c3_{i} >= c1_{i} THEN c3_{i}"
            f" WHEN c2_{i} >= c1_{i} THEN c2_{i} ELSE c1_{i} END AS b{i},"
            f" CASE WHEN c3_{i} >= c2_{i} AND c3_{i} >= c1_{i} THEN 3"
            f" WHEN c2_{i} >= c1_{i} THEN 2 ELSE 1 END AS l{i}"
        )
    return steps


def _tb_steps(d: dict) -> list[str]:
    """Traceback chain: walk positions MAXLEN..1; at the one step where
    the cursor sits (pos = k) emit the piece that ends there and jump
    back by its length. Both new columns read the PREVIOUS step's
    cursor, so each step is one projection."""
    app = d["app"]
    steps = []
    prev_pos, prev_pc = "length(w)", d["arr0"]
    for k in range(_ULM_MAXLEN, 0, -1):
        piece = f"substr(w, {k} - l{k} + 1, l{k})"
        steps.append(
            f"CASE WHEN {prev_pos} = {k}"
            f" THEN {app.format(lst=prev_pc, x=piece)}"
            f" ELSE {prev_pc} END AS pc{k},"
            f" CASE WHEN {prev_pos} = {k} THEN {prev_pos} - l{k}"
            f" ELSE {prev_pos} END AS p{k}"
        )
        prev_pos, prev_pc = f"p{k}", f"pc{k}"
    return steps


def _ulm_dp_fold(d: dict) -> str:
    """The Viterbi DP as ONE ``aggregate`` fold over positions 1..12:
    the accumulator carries the last three best scores (b_{i-3..i-1})
    plus the per-position argmax piece lengths. Returns the length
    array ``ls``. Runtime-iterated — linear expression size, immune to
    the CollapseProject inlining that made the unrolled-projection
    form exponential."""
    lk = d["lk"]
    lk1 = lk.format(key="substr(w, i, 1)", neg=_ULM_NEG)
    lk2 = lk.format(key="substr(w, i - 1, 2)", neg=_ULM_NEG)
    lk3 = lk.format(key="substr(w, i - 2, 3)", neg=_ULM_NEG)
    c1 = f"(acc.b + {lk1})"
    c2 = f"IF(i >= 2, acc.bm1 + {lk2}, CAST({_ULM_NEG2} AS BIGINT))"
    c3 = f"IF(i >= 3, acc.bm2 + {lk3}, CAST({_ULM_NEG2} AS BIGINT))"
    newb = (
        f"CASE WHEN {c3} >= {c2} AND {c3} >= {c1} THEN {c3}"
        f" WHEN {c2} >= {c1} THEN {c2} ELSE {c1} END"
    )
    newl = (
        f"CASE WHEN {c3} >= {c2} AND {c3} >= {c1} THEN 3"
        f" WHEN {c2} >= {c1} THEN 2 ELSE 1 END"
    )
    return (
        f"aggregate(sequence(1, {_ULM_MAXLEN}),"
        " struct(CAST(0 AS BIGINT) AS bm2, CAST(0 AS BIGINT) AS bm1,"
        " CAST(0 AS BIGINT) AS b, CAST(array() AS array<int>) AS ls),"
        " (acc, i) -> struct(acc.bm1 AS bm2, acc.b AS bm1,"
        f" {newb} AS b, concat(acc.ls, array({newl})) AS ls)).ls"
    )


def _ulm_tb_fold(d: dict) -> str:
    """Traceback as ONE fold over positions 12..1: the accumulator's
    cursor starts at the word length; at the single step where the
    cursor sits, emit the piece that ends there (length from ``ls``)
    and jump back by it."""
    piece = "substr(w, k - element_at(ls, k) + 1, element_at(ls, k))"
    app = d["app"].format(lst="acc.pc", x=piece)
    return (
        f"aggregate(sequence({_ULM_MAXLEN}, 1, -1),"
        " struct(length(w) AS pos, CAST(array() AS array<string>) AS pc),"
        " (acc, k) -> IF(acc.pos = k,"
        f" struct(acc.pos - element_at(ls, k) AS pos, {app} AS pc),"
        " acc)).pc"
    )


def _ulm_cte_body() -> str:
    """The shared WITH-body: corpus -> words -> seed -> vocab0 ->
    (EM iteration CTE chains) -> vocab{ITERS}. Training keys and the
    encode key both append their own tail."""
    d = _ULM_DUCK
    subs = " UNION ALL ".join(
        f"""
SELECT s AS p, cnt FROM (
  SELECT cnt, unnest(list_transform(
    generate_series(1, length(w) - {L} + 1), i -> substr(w, i, {L}))) AS s
  FROM words WHERE length(w) >= {L})"""
        for L in range(1, _ULM_MAXP + 1)
    )
    it_ctes = []
    prev_vocab = "vocab0"
    for r in range(1, _ULM_ITERS + 1):
        dp_chain = []
        src = f"m{r}x"
        for j, sel in enumerate(_dp_steps(d)):
            dp_chain.append(
                f"d{r}_{j} AS (SELECT *, {sel} FROM {src})"
            )
            src = f"d{r}_{j}"
        tb_chain = []
        for j, sel in enumerate(_tb_steps(d)):
            tb_chain.append(f"t{r}_{j} AS (SELECT *, {sel} FROM {src})")
            src = f"t{r}_{j}"
        it_ctes.append(
            f"""
map{r} AS (
  SELECT map_from_entries(list(struct_pack(k := p, v := lp))) AS m
  FROM {prev_vocab}
),
m{r}x AS (SELECT w, cnt, CAST(0 AS BIGINT) AS b0, m
          FROM words CROSS JOIN map{r}),
{",".join(dp_chain)},
{",".join(tb_chain)},
cnt{r} AS (
  SELECT piece AS p, CAST(sum(cnt) AS BIGINT) AS f
  FROM (SELECT cnt, unnest(pc1) AS piece FROM {src})
  GROUP BY piece
),
tot{r} AS (SELECT CAST(sum(f) AS BIGINT) AS t FROM cnt{r}),
vocab{r} AS (
  SELECT p, f, {_qln("f", "t")} AS lp FROM cnt{r}, tot{r}
)"""
        )
        prev_vocab = f"vocab{r}"
    return f"""
toks AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
words AS (
  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM toks
  WHERE length(w) BETWEEN 1 AND {_ULM_MAXLEN} GROUP BY w
),
subfreq AS (SELECT p, CAST(sum(cnt) AS BIGINT) AS f FROM ({subs}) GROUP BY p),
seed AS (
  SELECT p, f FROM subfreq WHERE length(p) = 1
  UNION ALL
  SELECT p, f FROM (
    SELECT p, f, row_number() OVER (ORDER BY f DESC, p) AS rn
    FROM subfreq WHERE length(p) >= 2 AND f >= {_ULM_SEED_MIN}
  ) WHERE rn <= {_ULM_SEED_CAP}
),
tot0 AS (SELECT CAST(sum(f) AS BIGINT) AS t FROM seed),
vocab0 AS (SELECT p, f, {_qln("f", "t")} AS lp FROM seed, tot0),
{",".join(it_ctes)}"""


def _ulm_sql() -> str:
    return f"""
WITH {_ulm_cte_body().strip()}
SELECT p AS piece, CAST(length(p) AS INT) AS plen, f AS n_uses, lp AS logp_q,
       CAST(rn AS INT) AS rnk
FROM (
  SELECT p, f, lp, row_number() OVER (ORDER BY f DESC, p) AS rn
  FROM vocab{_ULM_ITERS}
) WHERE rn <= {_ULM_TOPK}
"""


def _ulm_train(spark: SparkSession, sf_dir: str):
    """Shared Spark training chain: returns (words, vocab) — the
    pinned distinct word table and the final EM vocabulary
    (p, f, lp)."""
    d = _ULM_SPARK
    docs = load(spark, sf_dir, "documents").select("text")
    words = pin(
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w").between(1, _ULM_MAXLEN))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("cnt")),
        label="ulm_words",
    )
    subs = None
    for L in range(1, _ULM_MAXP + 1):
        s = words.filter(F.length("w") >= L).select(
            F.explode(
                F.expr(
                    f"transform(sequence(1, length(w) - {L} + 1),"
                    f" i -> substr(w, i, {L}))"
                )
            ).alias("p"),
            "cnt",
        )
        subs = s if subs is None else subs.unionByName(s)
    subfreq = subs.groupBy("p").agg(
        F.sum("cnt").cast("bigint").alias("f")
    )
    # pinned: without it the substring explode + groupBy above executes
    # TWICE — once for the tot0 broadcast below and again when round 1's
    # broadcast map aggregates vocab (guide §1.2 "don't compute things
    # you throw away"; same fix as the per-round cnt pin below)
    seed = pin(
        subfreq.filter(F.length("p") == 1).unionByName(
            subfreq.filter(
                (F.length("p") >= 2) & (F.col("f") >= _ULM_SEED_MIN)
            )
            .selectExpr(
                "p", "f", "row_number() OVER (ORDER BY f DESC, p) AS rn"
            )
            .filter(f"rn <= {_ULM_SEED_CAP}")
            .select("p", "f")
        ),
        label="ulm_seed",
    )
    tot0 = seed.agg(F.sum("f").cast("bigint").alias("t"))
    vocab = seed.crossJoin(F.broadcast(tot0)).selectExpr(
        "p", "f", _qln("f", "t") + " AS lp"
    )
    for r in range(1, _ULM_ITERS + 1):
        m = F.broadcast(
            vocab.agg(
                F.expr(
                    "map_from_entries(collect_list(struct(p, lp))) AS m"
                )
            )
        )
        # BOTH DP and traceback run as ONE runtime `aggregate` fold
        # each (the _dq_fold_expr discipline): unrolled chained
        # projections hit Catalyst's CollapseProject, which inlines
        # b_i into b_{i+1} into b_{i+2}... — an exponentially-sized
        # expression tree that hangs the optimizer even on 31 words.
        # A fold is a single linear-size expression the executor
        # iterates at runtime.
        cur = (
            words.crossJoin(m)
            .selectExpr("w", "cnt", _ulm_dp_fold(d) + " AS ls")
            .selectExpr("w", "cnt", _ulm_tb_fold(d) + " AS pc1")
        )
        # pin the PIECE COUNTS, not the vocab built from them: the old
        # per-round vocab pin executed the Viterbi fold TWICE per round
        # — once inside the tot_r broadcast job and again inside the
        # pin's own materialization (cnt_r was unpinned lineage under
        # both) — doubling the EM round cost. Pinning cnt_r runs the
        # fold exactly once; tot_r and the vocab projection are then
        # map-side reads of the pinned (Heaps-bounded) count table.
        cnt_r = pin(
            cur.select("cnt", F.explode("pc1").alias("piece"))
            .groupBy(F.col("piece").alias("p"))
            .agg(F.sum("cnt").cast("bigint").alias("f")),
            label=f"ulm_cnt{r}",
        )
        tot_r = cnt_r.agg(F.sum("f").cast("bigint").alias("t"))
        vocab = cnt_r.crossJoin(F.broadcast(tot_r)).selectExpr(
            "p", "f", _qln("f", "t") + " AS lp"
        )
    return words, vocab


@register("text_unigram_lm_em", oracle=_ulm_sql())
def text_unigram_lm_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer training by hard EM (Kudo, ACL 2018,
    simplified to Viterbi E-steps) — the second production tokenizer
    trainer beside text_bpe_train, completing the pair every LLM data
    stack ships: seed vocabulary = all corpus characters plus the top
    192 length-2..3 substrings by weighted frequency; each EM round
    Viterbi-segments every DISTINCT word under the current quantized
    piece logprobs (longer piece wins ties — deterministic), then
    re-estimates logprobs from the chosen pieces' weighted counts.
    Pieces the E-step stops choosing drop out of the vocabulary — the
    EM pruning that distinguishes unigram-LM from BPE's greedy merges.

    Scale shape: the corpus collapses to the distinct word table
    (Heaps-bounded) before any EM work; the Viterbi DP and traceback
    each run as ONE map-side `aggregate` fold reading piece logprobs
    from ONE broadcast map row (no join, no shuffle, and no unrolled
    projection chain — see _ulm_dp_fold on why); each M-step is one
    explode + map-side-combined groupBy. EM at 100 TB costs
    iterations x one word-table pass + the initial tokenize. All
    scores are ln-quantized BIGINTs (round(ln(p)*1e6)), so the
    segmentation argmax is integer comparison — bitwise equal
    cross-engine, same discipline as ml_logreg_gd. Emitted: the top-48
    final vocabulary rows (piece, plen, n_uses, logp_q, rnk)."""
    words, vocab = _ulm_train(spark, sf_dir)
    return vocab.selectExpr(
        "p", "f", "lp", "row_number() OVER (ORDER BY f DESC, p) AS rn"
    ).filter(f"rn <= {_ULM_TOPK}").selectExpr(
        "p AS piece",
        "CAST(length(p) AS INT) AS plen",
        "f AS n_uses",
        "lp AS logp_q",
        "CAST(rn AS INT) AS rnk",
    )


# ---------------------------------------------------------------------------
# apply the trained unigram vocabulary: per-document segmentation stats
# ---------------------------------------------------------------------------


def _ulm_encode_sql() -> str:
    d = _ULM_DUCK
    r = _ULM_ITERS + 1  # one more E-step under the FINAL vocabulary
    dp_chain = []
    src = f"m{r}x"
    for j, sel in enumerate(_dp_steps(d)):
        dp_chain.append(f"d{r}_{j} AS (SELECT *, {sel} FROM {src})")
        src = f"d{r}_{j}"
    tb_chain = []
    for j, sel in enumerate(_tb_steps(d)):
        tb_chain.append(f"t{r}_{j} AS (SELECT *, {sel} FROM {src})")
        src = f"t{r}_{j}"
    return f"""
WITH {_ulm_cte_body().strip()},
map{r} AS (
  SELECT map_from_entries(list(struct_pack(k := p, v := lp))) AS m
  FROM vocab{_ULM_ITERS}
),
m{r}x AS (SELECT w, cnt, CAST(0 AS BIGINT) AS b0, m
          FROM words CROSS JOIN map{r}),
{",".join(dp_chain)},
{",".join(tb_chain)},
wp AS (SELECT w, CAST(len(pc1) AS BIGINT) AS np FROM {src}),
dw AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
  ) WHERE length(w) BETWEEN 1 AND {_ULM_MAXLEN}
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
       CAST(sum(np) AS BIGINT) AS n_pieces,
       round(sum(np) / CAST(count(*) AS DOUBLE), 4) AS fertility
FROM dw JOIN wp USING (w) GROUP BY doc_id
"""


@register("text_unigram_encode_docs", oracle=_ulm_encode_sql())
def text_unigram_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the trained unigram-LM vocabulary: Viterbi-segment every
    document under the final EM logprobs and report per-document piece
    counts and fertility (pieces per word) — the tokenizer-cost signal
    a data pipeline uses to price documents in tokens and to spot
    out-of-domain text (high fertility = the tokenizer fragments it;
    the unigram twin of text_bpe_encode_docs + text_tokenizer_fertility
    which measure the BPE side). The segmentation E-step runs ONCE per
    DISTINCT word (Heaps-bounded, the same fold as training) and
    documents join the per-word piece counts on the word key — the
    corpus-sized pass is one tokenize + one broadcast join + one
    groupBy, never a per-document DP. Words longer than the 12-char
    training cap are excluded from both counts (the cap is the
    trainer's contract, stated here once). Emitted: (doc_id, n_tok,
    n_pieces, fertility)."""
    d = _ULM_SPARK
    words, vocab = _ulm_train(spark, sf_dir)
    m = F.broadcast(
        vocab.agg(
            F.expr("map_from_entries(collect_list(struct(p, lp))) AS m")
        )
    )
    wp = (
        words.crossJoin(m)
        .selectExpr("w", _ulm_dp_fold(d) + " AS ls")
        .selectExpr("w", _ulm_tb_fold(d) + " AS pc1")
        .selectExpr("w", "CAST(size(pc1) AS BIGINT) AS np")
    )
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    dw = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.length("w").between(1, _ULM_MAXLEN))
    return (
        dw.join(F.broadcast(wp), "w")
        .groupBy("doc_id")
        .agg(
            F.expr("CAST(count(*) AS BIGINT) AS n_tok"),
            F.expr("CAST(sum(np) AS BIGINT) AS n_pieces"),
            F.expr(
                "round(sum(np) / CAST(count(*) AS DOUBLE), 4) AS fertility"
            ),
        )
    )
