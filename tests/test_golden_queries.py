"""Golden query corpus (use-cases.sql / README.md) vs a DuckDB oracle over
the golden tables, plus idiomatic-vs-literal plan equivalence."""

from presto_ethereum_spark.plans import golden
from tests.conftest import rows_match


def test_block_time_deltas_vs_oracle(chain_source, duck):
    df = golden.block_time_deltas(chain_source.table("block"), 1, 50)
    want = duck.execute(
        """
        SELECT b.bn, (b.block_timestamp - a.block_timestamp) AS delta
        FROM (SELECT block_number AS bn, block_timestamp FROM block
              WHERE block_number>=1 AND block_number<=50) AS a
        JOIN (SELECT (block_number-1) AS bn, block_timestamp FROM block
              WHERE block_number>=2 AND block_number<=51) AS b
        ON a.bn=b.bn ORDER BY b.bn
        """
    ).fetchall()
    assert len(want) == 50
    rows_match(df, want, sort=False)


def test_literal_matches_idiomatic(chain_source):
    block = chain_source.table("block")
    a = golden.block_time_deltas(block, 1, 200).collect()
    b = golden.block_time_deltas_literal(block, 1, 200).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_scalable_deltas_match_window(chain_source):
    block = chain_source.table("block")
    scalable = {
        r["bn"]: r["delta"]
        for r in golden.block_time_deltas_scalable(block, bucket_size=500).collect()
    }
    # scalable keys by the LATER block: delta(bn) = ts(bn) - ts(bn-1)
    simple = {
        r["bn"] + 1: r["delta"]
        for r in golden.block_time_deltas(block, 1, 2399).collect()
    }
    assert scalable == simple


def test_avg_block_time_by_chunk_vs_oracle(chain_source, duck):
    df = golden.avg_block_time_by_chunk(chain_source.table("block"), 1, 2000, 200)
    want = duck.execute(
        """
        WITH X AS (
          SELECT b.bn, (b.block_timestamp - a.block_timestamp) AS delta
          FROM (SELECT block_number AS bn, block_timestamp FROM block
                WHERE block_number>=1 AND block_number<=2000) AS a
          JOIN (SELECT (block_number-1) AS bn, block_timestamp FROM block
                WHERE block_number>=2 AND block_number<=2001) AS b
          ON a.bn=b.bn)
        SELECT min(bn) AS chunkstart, avg(delta) AS avg_delta
        FROM (SELECT ntile(10) OVER (ORDER BY bn) AS chunk, * FROM X) AS T
        GROUP BY chunk ORDER BY chunkstart
        """
    ).fetchall()
    assert len(want) == 10
    rows_match(df, want, sort=False)


def test_top_miners_vs_oracle(chain_source, duck):
    df = golden.top_miners(chain_source.table("block"), 100000, 15)
    want = duck.execute(
        """
        SELECT block_miner, count(*) AS num, count(*)/100000.0 AS percent
        FROM block WHERE block_number<=100000
        GROUP BY block_miner ORDER BY num DESC, block_miner LIMIT 15
        """
    ).fetchall()
    rows_match(df, want, sort=False)


def test_erc20_token_movement_vs_oracle(chain_source, duck):
    df = golden.erc20_token_movement(chain_source.table("erc20"), 100, 600)
    want = duck.execute(
        """
        SELECT erc20_token, SUM(erc20_value) AS total_value FROM erc20
        WHERE erc20_blocknumber >= 100 AND erc20_blocknumber <= 600
        GROUP BY erc20_token ORDER BY erc20_token
        """
    ).fetchall()
    assert len(want) > 10
    rows_match(df, want, sort=False)
