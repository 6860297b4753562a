"""URL enrichment stage: canonical url + fingerprints + host + partition.

Fuses the reference's middleware chain into ONE vectorized map_batches pass
(reference runs them per-request-object: UrlFingerprintMiddleware →
DomainMiddleware → DomainFingerprintMiddleware,
frontera/contrib/middlewares/fingerprint.py:~1-110 + domain.py:~1-120;
approximate cites, SURVEY.md §0).

Input: any Arrow table with a ``url`` column. Output: same table with
``url`` canonicalized and columns fp64/fp_hex/host/host_hash/partition
appended (FRONTIER key columns).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.urlnorm import canonicalize_array, extract_host_array
from ..functions.fingerprint import sha1_batch, crc32_batch, partitions_from_host_hash


def enrich_urls(batch: pa.Table, num_partitions: int, url_col: str = "url") -> pa.Table:
    urls = canonicalize_array(batch[url_col])
    hosts = extract_host_array(urls)
    fps, hexes = sha1_batch(urls.to_pylist())
    host_hash = crc32_batch(hosts.to_pylist())
    parts = partitions_from_host_hash(host_hash, num_partitions)
    out = batch.set_column(batch.schema.get_field_index(url_col), url_col, urls)
    return (
        out.append_column("fp64", pa.array(fps, pa.uint64()))
        .append_column("fp_hex", pa.array(hexes, pa.string()))
        .append_column("host", hosts)
        .append_column("host_hash", pa.array(host_hash, pa.int64()))
        .append_column("partition", pa.array(parts, pa.int32()))
    )


class EnrichStage:
    """map_batches callable: ``ds.map_batches(EnrichStage(P), batch_format="pyarrow")``."""

    def __init__(self, num_partitions: int, url_col: str = "url"):
        self.num_partitions = num_partitions
        self.url_col = url_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return enrich_urls(batch, self.num_partitions, self.url_col)
