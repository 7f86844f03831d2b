"""WARC writer/reader: Common-Crawl-style ingestion round trip."""

import glob

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pythongis_ray import pages, sources

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("compress", [False, True])
def test_warc_roundtrip_bit_exact(ray_session, tmp_path, compress):
    d = str(tmp_path / "warc")
    ds = pages.pages_dataset(SF, geocode=False,
                             columns=["url", "warc_ts", "html"])
    n = sources.write_warc(ds, d, compress=compress)
    assert n == 500
    suffix = ".warc.gz" if compress else ".warc"
    parts = [p for p in glob.glob(f"{d}/*") if not p.endswith(".json")]
    assert parts and all(p.endswith(suffix) for p in parts)
    back = sources.read_warc(d).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    orig = ds.to_pandas().sort_values("url").reset_index(drop=True)
    assert back["url"].equals(orig["url"])
    assert back["warc_ts"].equals(orig["warc_ts"])  # µs-exact
    assert all(bytes(a) == bytes(b)
               for a, b in zip(back["html"], orig["html"]))


def test_warc_text_identity_through_ingestion(ray_session, tmp_path):
    """North-rule invariant: text extracted from WARC-ingested html is
    byte-identical to the carried text per url."""
    import pandas as pd

    d = str(tmp_path / "warc")
    ds = pages.pages_dataset(SF, geocode=False,
                             columns=["url", "warc_ts", "html", "text"])
    sources.write_warc(ds, d)
    back = sources.read_warc(d)
    ext = back.map_batches(pages.extract_text, batch_format="pyarrow",
                           batch_size=2048) \
        .select_columns(["url", "text_extracted"]).to_pandas()
    orig = ds.select_columns(["url", "text"]).to_pandas()
    m = orig.merge(ext, on="url")
    assert len(m) == len(orig)
    assert (m.text == m.text_extracted).all()


def test_warc_parser_rejects_malformed(ray_session):
    with pytest.raises(ValueError, match="bad record header"):
        sources.parse_warc_bytes(b"NOT A WARC")
    good = sources.parse_warc_bytes(
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: u\r\nWARC-Date: 2024-01-01T00:00:00.000001\r\n"
        b"Content-Length: 3\r\n\r\nabc\r\n\r\n")
    assert good.num_rows == 1
    assert good["html"][0].as_py() == b"abc"
    with pytest.raises(ValueError, match="truncated"):
        sources.parse_warc_bytes(
            b"WARC/1.0\r\nWARC-Target-URI: u\r\n"
            b"WARC-Date: 2024-01-01T00:00:00\r\n"
            b"Content-Length: 99\r\n\r\nabc")
    # payload containing the record delimiter parses correctly
    tricky = b"x\r\n\r\nWARC/1.0\r\ny"
    rec = (b"WARC/1.0\r\nWARC-Target-URI: u\r\n"
           b"WARC-Date: 2024-01-01T00:00:00\r\n"
           + f"Content-Length: {len(tricky)}\r\n\r\n".encode()
           + tricky + b"\r\n\r\n")
    out = sources.parse_warc_bytes(rec * 2)
    assert out.num_rows == 2
    assert out["html"][1].as_py() == tricky


def test_warc_manifest_hides_stale_parts(ray_session, tmp_path):
    """A re-run with different batching must not resurrect old part
    files: read_warc follows the latest manifest."""
    import os

    d = str(tmp_path / "warc")
    ds = pages.pages_dataset(SF, geocode=False,
                             columns=["url", "warc_ts", "html"])
    sources.write_warc(ds, d)
    # plant a stale part that is NOT in the manifest
    stale = os.path.join(d, "part-deadbeef-1.warc")
    with open(stale, "wb") as f:
        f.write(b"WARC/1.0\r\nWARC-Target-URI: https://stale/1\r\n"
                b"WARC-Date: 2020-01-01T00:00:00\r\n"
                b"Content-Length: 1\r\n\r\nx\r\n\r\n")
    back = sources.read_warc(d).to_pandas()
    assert len(back) == 500
    assert not back.url.str.contains("stale").any()


def test_jsonl_roundtrip_byte_identity(ray_session, tmp_path):
    d = str(tmp_path / "jsonl")
    import ray.data as rd

    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    sources.write_jsonl(ds, d)
    back = sources.read_jsonl(d).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    orig = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"]) \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(back) == len(orig)
    assert (back.text == orig.text).all()
