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

Skew: postcode and postcode-sector keys are Zipf-distributed. Two
defences, both on by default at scale:
 - AQE skew-join splitting (session default, see session.py)
 - optional explicit salting (``salt``>1): the canonical side gets
   salt = hash(id) % salt, the messy side is replicated to every salt
   value — all pairs are still produced exactly once, but a hot key's
   canonical rows spread over ``salt`` reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"


def _out(pc: Column) -> Column:
    return F.split_part(pc, F.lit(" "), F.lit(1))


def _in(pc: Column) -> Column:
    return F.split_part(pc, F.lit(" "), F.lit(2))


def _k(name: str):
    return lambda df: df[name]


def _pc_out(df):
    return _out(df["postcode"])


def _pc_in(df):
    return _in(df["postcode"])


def _arr(name: str, i: int):
    return lambda df: F.try_element_at(df[name], F.lit(i))


N1, N2 = _k("numeric_token_1"), _k("numeric_token_2")
PC = _k("postcode")
U1, U2 = _arr("unusual_tokens_arr", 1), _arr("unusual_tokens_arr", 2)
V1, V2 = _arr("very_unusual_tokens_arr", 1), _arr("very_unusual_tokens_arr", 2)
E1 = _arr("extremely_unusual_tokens_arr", 1)

# (l_key, r_key) component pairs per rule — transcription of
# linking_model/blocking.py:1-25 (l = canonical, r = messy; the reference's
# cross-column rules like `l.numeric_token_1 = r.numeric_token_2` become
# asymmetric component pairs) + the appended block_on("postcode").
BLOCKING_RULES: list[list[tuple]] = [
    [(N1, N1), (U1, U1), (U2, U2), (_pc_out, _pc_out)],
    [(N1, N2), (U1, U1), (_pc_out, _pc_out)],
    [(N1, N2), (U1, U1), (_pc_in, _pc_in)],
    [(N1, N1), (U1, U2), (U2, U1), (_pc_out, _pc_out)],
    [(N1, N1), (U1, U2), (_pc_in, _pc_in)],
    [(N1, N1), (PC, PC)],
    [(N1, N2), (PC, PC)],
    [(U1, U2), (PC, PC)],
    [(V1, V1), (N1, N1)],
    [(V1, V2), (N1, N1)],
    [(N2, N2), (U1, U1), (_pc_out, _pc_out)],
    [(N1, N1), (U1, U1), (_pc_in, _pc_in)],
    [(N2, N2), (U1, U1), (_pc_in, _pc_in)],
    [(N2, N2), (PC, PC)],
    [(N1, N1), (N2, N2), (_pc_out, _pc_out)],
    [(N1, N1), (N2, N2), (_pc_in, _pc_in)],
    [(E1, E1), (_pc_out, _pc_out)],
    [(PC, PC)],
]


def _rule_key(df: DataFrame, components) -> Column:
    cols = [c(df).cast("string") for c in components]
    non_null = None
    for c in cols:
        non_null = c.isNotNull() if non_null is None else (non_null & c.isNotNull())
    return F.when(non_null, F.concat_ws(SEP, *cols))


def blocking_keys(
    df: DataFrame, side: str, rules: list[list[tuple]] | None = None
) -> DataFrame:
    """Emit (rule_id, key, unique_id) — one row per rule with a complete key.

    ``side`` is 'l' (canonical: key built from the left component of each
    pair) or 'r' (messy: right component).
    """
    rules = BLOCKING_RULES if rules is None else rules
    idx = 0 if side == "l" else 1
    keys = F.array(
        *[
            F.struct(
                F.lit(i).alias("rule_id"),
                _rule_key(df, [pair[idx] for pair in rule]).alias("key"),
            )
            for i, rule in enumerate(rules)
        ]
    )
    return df.select(
        "unique_id", F.explode(F.filter(keys, lambda k: k["key"].isNotNull())).alias("k")
    ).select(F.col("k")["rule_id"].alias("rule_id"), F.col("k")["key"].alias("key"), "unique_id")


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
    return pairs.dropDuplicates(["unique_id_l", "unique_id_r"])


def block_on(columns: list[str]) -> list[list[tuple]]:
    """Single-rule blocking on plain column equality (reference tests use
    block_on('test_block') — tests/test_edge_cases.py:48-50)."""
    return [[(_k(c), _k(c)) for c in columns]]
