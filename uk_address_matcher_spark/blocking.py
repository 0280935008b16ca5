"""Multi-rule blocking as ONE shuffle: key-union hash join.

The reference declares 18 OR-ed composite blocking rules
(/root/reference/uk_address_matcher/linking_model/blocking.py:1-25 plus
block_on("postcode") at linking_model/training.py:549); Splink executes
them as a cascade of separate joins. Here each record emits one
(rule_id, key) row per rule whose components are all non-null, both
sides join once on (rule_id, key), and pairs are deduplicated — a single
narrow shuffle of (key, id) pairs instead of 18 wide joins, with the
candidate-pair semantics unchanged (each qualifying pair appears exactly
once regardless of how many rules fire, matching Splink's
AND-NOT-previous-rules cascade).

Rule components are SQL-text fragments (see sqlexpr module doc: the
Column API costs ~ms of Py4J per operator node; the 18-rule key array is
hundreds of nodes and is built fresh per linkage call).

Skew: postcode and postcode-sector keys are Zipf-distributed. Two
defences, both on by default at scale:
 - AQE skew-join splitting (session default, see session.py)
 - optional explicit salting (``salt``>1): the canonical side gets
   salt = hash(id) % salt, the messy side is replicated to every salt
   value — all pairs are still produced exactly once, but a hot key's
   canonical rows spread over ``salt`` reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uk_address_matcher_spark import sqlexpr as X

SEP = "\x1f"

N1, N2 = "numeric_token_1", "numeric_token_2"
PC = "postcode"
PC_OUT = "split_part(postcode, ' ', 1)"
PC_IN = "split_part(postcode, ' ', 2)"
U1, U2 = (
    "try_element_at(unusual_tokens_arr, 1)",
    "try_element_at(unusual_tokens_arr, 2)",
)
V1, V2 = (
    "try_element_at(very_unusual_tokens_arr, 1)",
    "try_element_at(very_unusual_tokens_arr, 2)",
)
E1 = "try_element_at(extremely_unusual_tokens_arr, 1)"

# (l_key, r_key) component pairs per rule — transcription of
# linking_model/blocking.py:1-25 (l = canonical, r = messy; the reference's
# cross-column rules like `l.numeric_token_1 = r.numeric_token_2` become
# asymmetric component pairs) + the appended block_on("postcode").
BLOCKING_RULES: list[list[tuple]] = [
    [(N1, N1), (U1, U1), (U2, U2), (PC_OUT, PC_OUT)],
    [(N1, N2), (U1, U1), (PC_OUT, PC_OUT)],
    [(N1, N2), (U1, U1), (PC_IN, PC_IN)],
    [(N1, N1), (U1, U2), (U2, U1), (PC_OUT, PC_OUT)],
    [(N1, N1), (U1, U2), (PC_IN, PC_IN)],
    [(N1, N1), (PC, PC)],
    [(N1, N2), (PC, PC)],
    [(U1, U2), (PC, PC)],
    [(V1, V1), (N1, N1)],
    [(V1, V2), (N1, N1)],
    [(N2, N2), (U1, U1), (PC_OUT, PC_OUT)],
    [(N1, N1), (U1, U1), (PC_IN, PC_IN)],
    [(N2, N2), (U1, U1), (PC_IN, PC_IN)],
    [(N2, N2), (PC, PC)],
    [(N1, N1), (N2, N2), (PC_OUT, PC_OUT)],
    [(N1, N1), (N2, N2), (PC_IN, PC_IN)],
    [(E1, E1), (PC_OUT, PC_OUT)],
    [(PC, PC)],
]


def _quote_component(c: str) -> str:
    """Backtick-quote a component that is a plain column NAME (so names
    with spaces/hyphens/reserved words survive the SQL splice); leave
    anything that is already an expression (contains parentheses or
    backticks) untouched."""
    if "(" in c or ")" in c or "`" in c:
        return c
    return "`" + c.replace("`", "``") + "`"


def _rule_key_sql(components: list[str]) -> str:
    cols = [f"cast({_quote_component(c)} as string)" for c in components]
    non_null = " AND ".join(f"{c} IS NOT NULL" for c in cols)
    return f"CASE WHEN {non_null} THEN concat_ws('{SEP}', {', '.join(cols)}) END"


@X.scoped
def blocking_keys(
    df: DataFrame, side: str, rules: list[list[tuple]] | None = None
) -> DataFrame:
    """Emit (rule_id, key, unique_id) — one row per rule with a complete key.

    ``side`` is 'l' (canonical: key built from the left component of each
    pair) or 'r' (messy: right component).
    """
    rules = BLOCKING_RULES if rules is None else rules
    idx = 0 if side == "l" else 1
    structs = ", ".join(
        f"named_struct('rule_id', {i}, 'key', "
        f"{_rule_key_sql([pair[idx] for pair in rule])})"
        for i, rule in enumerate(rules)
    )
    v = X.gensym("k")
    return df.selectExpr(
        "unique_id",
        f"explode(filter(array({structs}), {v} -> {v}.key IS NOT NULL)) AS k",
    ).selectExpr("k.rule_id AS rule_id", "k.key AS key", "unique_id")


def block(
    cleaned_l: DataFrame,
    cleaned_r: DataFrame,
    rules: list[list[tuple]] | None = None,
    salt: int = 1,
) -> DataFrame:
    """Candidate pairs (unique_id_l, unique_id_r), each exactly once.

    One narrow shuffle over (rule_id, key [, salt]); dedup is a second
    shuffle over the id pair. Everything wide (token maps etc.) is joined
    back AFTER dedup by the scorer, so the skew-prone exchange only moves
    ids and key strings.
    """
    kl = blocking_keys(cleaned_l, "l", rules)
    kr = blocking_keys(cleaned_r, "r", rules)
    join_cols = ["rule_id", "key"]
    if salt > 1:
        kl = kl.withColumn("salt", F.pmod(F.xxhash64("unique_id"), F.lit(salt)))
        kr = kr.withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        ).withColumn("salt", F.col("salt").cast("long"))
        join_cols.append("salt")
    pairs = kl.join(kr.withColumnRenamed("unique_id", "unique_id_r"), join_cols).select(
        F.col("unique_id").alias("unique_id_l"), "unique_id_r"
    )
    # The dedup's hash exchange on the id pair FEEDS the scoring kernel:
    # every downstream attach join is a broadcast, so the kernel stage's
    # task count IS this exchange's width. Left to AQE, byte-targeted
    # coalescing sizes it to ~1 task/core (the pair rows are narrow but
    # the kernel is CPU-dense per byte: measured 171.5 executor-CPU-s over
    # 32 tasks, max task 7.4 s vs mean 5.4 s — one ragged wave). An
    # explicit repartition on the SAME key replaces — not adds to — the
    # exchange the dedup aggregate needs (the aggregate reuses the
    # partitioning), and 3 tasks/core keeps the wave balanced at any
    # parallelism. Trade-off: map-side partial dedup is lost, but only
    # same-map-task duplicate pairs ever combined early, and the rows are
    # two ids.
    n_part = 3 * cleaned_l.sparkSession.sparkContext.defaultParallelism
    pairs = pairs.repartition(n_part, "unique_id_l", "unique_id_r")
    return pairs.dropDuplicates(["unique_id_l", "unique_id_r"])


def block_on(columns: list[str]) -> list[list[tuple]]:
    """Single-rule blocking on plain column equality (reference tests use
    block_on('test_block') — tests/test_edge_cases.py:48-50)."""
    return [[(c, c) for c in columns]]
