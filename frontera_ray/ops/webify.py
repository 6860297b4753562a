"""Webify: derive a Common-Crawl-style `pages` table (input_hint shape)
from the driver's `documents` testdata — deterministic, so the flagship
crawl in __ray_entry__.entry() runs over real testdata bytes.

Each source becomes a host; its documents (ordered by doc_id) become pages
p0..pn with the same binary-tree + cross-host link graph as the synthetic
fixture (sources/synth.py). `text` is the document text VERBATIM (the
byte-identity invariant flows from testdata through the crawl to the out
table).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..sources import synth
from ..functions.fingerprint import fp64


def webify_documents(sf_dir: str, out_dir: str, num_partitions: int = 4) -> dict:
    """documents.parquet → pages/part-*.parquet + seeds.parquet under
    out_dir (idempotent via _SUCCESS marker). Returns synth.write_fixture-
    style paths dict."""
    marker = os.path.join(out_dir, "_SUCCESS")
    pages_dir = os.path.join(out_dir, "pages")
    seeds_path = os.path.join(out_dir, "seeds.parquet")
    if os.path.exists(marker):
        parts = sorted(
            os.path.join(pages_dir, f)
            for f in os.listdir(pages_dir)
            if f.endswith(".parquet")
        )
        return {"pages_dir": pages_dir, "seeds_path": seeds_path, "parts": parts}

    docs = (
        pq.read_table(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text", "lang", "source"],
        )
        .to_pandas()
        .sort_values(["source", "doc_id"])
    )
    hosts = sorted(docs["source"].unique())
    s_of = {h: i for i, h in enumerate(hosts)}
    S = len(hosts)

    urls, ts, htmls, texts, langs = [], [], [], [], []
    for host, g in docs.groupby("source", sort=True):
        s = s_of[host]
        n = len(g)
        for i, row in enumerate(g.itertuples()):
            url = f"http://{host}.test/p{i}"
            anchors = "".join(
                f'<a href="{h}">l</a>' for h in synth.outlinks(s, i, S, n)
            )
            urls.append(url)
            ts.append(synth.EPOCH_2026 + (fp64(url) % 86400) * 1_000_000)
            htmls.append(f"<html><body>{row.text}{anchors}</body></html>".encode())
            texts.append(row.text)
            langs.append(row.lang)
        # allow-all robots row per host
        rurl = f"http://{host}.test/robots.txt"
        urls.append(rurl)
        ts.append(synth.EPOCH_2026 + (fp64(rurl) % 86400) * 1_000_000)
        body = "User-agent: *\nDisallow:\n"
        htmls.append(body.encode())
        texts.append(body)
        langs.append("zz")

    tbl = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )

    os.makedirs(pages_dir, exist_ok=True)
    from ..functions.urlnorm import extract_host_array
    from ..functions.fingerprint import crc32_batch, partitions_from_host_hash

    hh = crc32_batch(extract_host_array(tbl["url"]).to_pylist())
    parts_col = partitions_from_host_hash(hh, num_partitions)
    paths = []
    for p in range(num_partitions):
        sub = tbl.filter(pa.array(parts_col == p))
        path = os.path.join(pages_dir, f"part-{p:05d}.parquet")
        pq.write_table(sub, path)
        paths.append(path)

    seeds = pa.table(
        {
            "url": pa.array(
                [f"http://{h}.test/p0" for h in hosts[: min(4, S)]], pa.string()
            ),
            "score": pa.array(
                [1.0 - i / 10 for i in range(min(4, S))], pa.float64()
            ),
        }
    )
    pq.write_table(seeds, seeds_path)
    with open(marker, "w") as f:
        f.write("ok")
    return {"pages_dir": pages_dir, "seeds_path": seeds_path, "parts": paths}
