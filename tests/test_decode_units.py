"""Unit tests for connector-equivalent decode primitives (SURVEY.md §5.3):
hex→double narrowing, h32→h20, token lookup — mirroring the reference cases
in EthereumERC20Utils.java:8-14, EthereumRecordCursor.java:173-174,433-435."""

import math

from presto_ethereum_spark.constants import (
    ERC20_TOKEN_BY_ADDRESS,
    hex_to_double,
    h32_to_h20,
    lookup_token,
)


class TestHexToDouble:
    def test_small_value(self):
        assert hex_to_double("0x2a") == 42.0

    def test_zero(self):
        assert hex_to_double("0x0") == 0.0

    def test_empty_data_is_zero(self):
        # ERC-721 guard: "0x" -> NumberFormatException -> 0.0
        assert hex_to_double("0x") == 0.0

    def test_non_hex_is_zero(self):
        assert hex_to_double("0xzz") == 0.0

    def test_none_is_zero(self):
        assert hex_to_double(None) == 0.0

    def test_above_2_63(self):
        v = 2**70 + 12345
        assert hex_to_double("0x" + format(v, "x")) == float(v)

    def test_above_2_53_rounds_like_double(self):
        v = 2**53 + 1  # not representable; rounds half-even to 2^53
        assert hex_to_double("0x" + format(v, "x")) == float(v) == 2.0**53

    def test_uint256_max(self):
        v = 2**256 - 1
        assert hex_to_double("0x" + "f" * 64) == float(v)

    def test_128_hex_chars_whole_data_parse(self):
        # >=3-topic logs parse the ENTIRE data string as one number
        # (EthereumRecordCursor.java:180).
        h = "0x" + "01" + "0" * 126
        assert hex_to_double(h) == float(int(h[2:], 16))

    def test_overflow_to_inf(self):
        assert hex_to_double("0x" + "f" * 300) == math.inf

    def test_uppercase_hex(self):
        assert hex_to_double("0xFF") == 255.0


class TestH32ToH20:
    def test_standard_topic(self):
        t = "0x" + "0" * 24 + "ab" * 20
        assert h32_to_h20(t) == "0x" + "ab" * 20
        assert len(h32_to_h20(t)) == 42


class TestTokenLookup:
    def test_known_lowercase(self):
        assert lookup_token("0x9a642d6b3368ddc662ca244badf32cda716005bc") == "QTUM"

    def test_known_case_insensitive(self):
        # the reference lowercases the log address before lookup
        assert lookup_token("0x9A642D6B3368DDC662CA244BADF32CDA716005BC") == "QTUM"

    def test_miss_preserves_original_case(self):
        addr = "0xAbC0000000000000000000000000000000000001"
        assert lookup_token(addr) == f"ERC20({addr})"

    def test_registry_size_and_shape(self):
        assert len(ERC20_TOKEN_BY_ADDRESS) == 42
        assert all(a == a.lower() and len(a) == 42 for a in ERC20_TOKEN_BY_ADDRESS)

    def test_enum_names(self):
        # spot-check non-trivial enum constant names used as symbols
        assert lookup_token("0x0abdace70d3790235af448c88547603b945604ea") == "district0x"
        assert lookup_token("0xd8912c10681d8b21fd3742244f44658dba12264e") == "Pluton"
        assert lookup_token("0x5c543e7ae0a1104f78406c340e9c64fd9fce5170") == "vSlice"


class TestVarcharBounds:
    def test_overlong_values_truncate_in_strict_mode(self, spark):
        """Reference parity (EthereumRecordCursor.java:263-268 /
        EthereumMetadata.java:48-51): varchar(n) columns truncate over-long
        values; Spark StringType is unbounded, so strict mode applies the
        declared widths explicitly."""
        from pyspark.sql import Row

        from presto_ethereum_spark.sources.decode import truncate_varchar_bounds

        long_hash = "0x" + "ab" * 50  # 102 chars, bound is 66
        df = spark.createDataFrame(
            [Row(block_hash=long_hash, block_miner="0x" + "cd" * 30,
                 block_extradata="z" * 1000, block_number=1)]
        )
        out = truncate_varchar_bounds(df, "block").first()
        assert len(out.block_hash) == 66
        assert out.block_hash == long_hash[:66]
        assert len(out.block_miner) == 42
        assert len(out.block_extradata) == 1000  # unbounded stays untouched
        assert out.block_number == 1  # non-varchar untouched

    def test_wellformed_data_unchanged(self, spark, chain_source):
        """On well-formed chain data the bounds never bite: strict and
        default decodes are identical."""
        from presto_ethereum_spark.sources.fixture import EthereumFixtureSource

        strict = EthereumFixtureSource(
            spark, chain_source.chain_path, strict_varchar=True
        )
        for tbl in ("block", "transaction", "erc20"):
            a, b = chain_source.table(tbl), strict.table(tbl)
            assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
