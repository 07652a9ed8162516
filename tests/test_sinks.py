"""CSV export sink round-trip (sits_csv.R analog)."""

import glob

import pandas as pd

from sits_spark import fixtures, sinks
from sits_spark.pipeline import RollupPipeline


def test_export_tier_csv_roundtrip(spark, tmp_path_factory):
    pdf = fixtures.gen_transcripts(30, seed=5, hot_turns=300)
    inp = str(tmp_path_factory.mktemp("csv_in") / "t")
    spark.createDataFrame(pdf).write.parquet(inp)
    wh = str(tmp_path_factory.mktemp("csv_wh"))
    pipe = RollupPipeline(spark, wh)
    pipe.run(inp, run_id="c1")

    out = str(tmp_path_factory.mktemp("csv_out") / "agg")
    sinks.export_tier_csv(pipe, "agg", out, single_file=True)
    files = glob.glob(out + "/*.csv")
    assert len(files) == 1  # single-file convenience export
    back = pd.read_csv(files[0])
    want = pipe.read_tier("agg").toPandas()
    assert len(back) == len(want)
    assert list(back.columns) == list(want.columns)
    # exact integer round-trip; timestamps ISO
    assert back["n_turns"].sum() == want["n_turns"].sum()
    assert back["window_start"].str.match(r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}").all()

    # packed tier: binary blobs hex-coded, decodable
    out2 = str(tmp_path_factory.mktemp("csv_out2") / "pk")
    sinks.export_tier_csv(pipe, "packed_1h", out2, single_file=True)
    back2 = pd.read_csv(glob.glob(out2 + "/*.csv")[0])
    from sits_spark import codec

    blob = bytes.fromhex(back2["vals_gorilla"].iloc[0])
    assert len(codec.decode_xor(blob)) == back2["n"].iloc[0]
