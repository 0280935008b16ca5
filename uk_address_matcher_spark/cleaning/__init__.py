from uk_address_matcher_spark.cleaning.pipeline import (  # noqa: F401
    clean_addresses,
    get_address_token_frequencies,
    get_common_end_tokens,
    get_numeric_term_frequencies,
)
