"""phoneNumber type parsing (SURVEY §1.2, §2.8; reference:
entities/models/phone_number.go — input + defaultCountry ->
{internationalFormatted, nationalFormatted, countryCode, valid}).

The reference delegates to a full phone-number library; that library is
not in this container, so this is a deterministic RULE-BASED parser
covering the common shapes (E.164 `+<cc><national>`, `00<cc>...`,
national digits + defaultCountry). The struct schema and plan shape are
the real contract; swapping in `phonenumbers` is a one-function change.
Pure Catalyst expressions — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# minimal calling-code map for the rule-based parser (extend freely)
COUNTRY_CODES = {
    "US": 1, "CA": 1, "GB": 44, "DE": 49, "FR": 33, "NL": 31, "ES": 34,
    "IT": 39, "AU": 61, "JP": 81, "CN": 86, "IN": 91, "BR": 55,
}

_CC_BY_LEN = sorted(
    {str(c) for c in COUNTRY_CODES.values()}, key=len, reverse=True
)


def parse_phone(input_col: Column, default_country: Column | str = "US") -> Column:
    """Parse a phone string into the weaviate phoneNumber struct."""
    if isinstance(default_country, str):
        default_country = F.lit(default_country)
    digits = F.regexp_replace(input_col, r"[^0-9+]", "")
    intl = digits.startswith("+") | digits.startswith("00")
    # normalize international prefix to bare digits
    bare = (
        F.when(digits.startswith("+"), F.substring(digits, 2, 32))
        .when(digits.startswith("00"), F.substring(digits, 3, 32))
        .otherwise(digits)
    )

    # country code: longest-prefix match against the known codes for
    # international inputs; default country's code otherwise
    cc_map = F.create_map(
        *[x for k, v in sorted(COUNTRY_CODES.items()) for x in (F.lit(k), F.lit(v))]
    )
    default_cc = cc_map[default_country]
    intl_cc = None
    for code in _CC_BY_LEN:
        cond = bare.startswith(code)
        hit = F.lit(int(code))
        intl_cc = F.when(cond, hit) if intl_cc is None else intl_cc.when(cond, hit)
    intl_cc = intl_cc.otherwise(F.lit(None).cast("long")) if intl_cc is not None else F.lit(None)

    country_code = F.when(intl, intl_cc).otherwise(default_cc.cast("long"))
    national = F.when(
        intl & country_code.isNotNull(),
        bare.substr(F.length(country_code.cast("string")) + 1, F.lit(32)),
    ).otherwise(bare)

    valid = country_code.isNotNull() & (F.length(national) >= 6) & (F.length(national) <= 12)
    return F.struct(
        input_col.alias("input"),
        default_country.alias("defaultCountry"),
        F.when(valid, F.concat(F.lit("+"), country_code.cast("string"), national))
        .alias("internationalFormatted"),
        F.when(valid, national).alias("nationalFormatted"),
        country_code.alias("countryCode"),
        valid.alias("valid"),
    )
