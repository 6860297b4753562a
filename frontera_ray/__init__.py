"""frontera_ray — a Ray-Data-native crawl-frontier + data-processing engine.

A from-scratch reimplementation of the capabilities of the reference
crawl-frontier framework (yuanbei/frontera, a Frontera fork; see SURVEY.md):
URL canonicalization + fingerprinting, a sharded URL-seen set (cuckoo filter
with bloom fallback in front of an exact store), per-host politeness budgets
and robots.txt gating, a host-partitioned priority queue, OPIC/hostrank
scoring, and epoch-checkpointed resumable execution — all expressed as
``ray.data.Dataset`` pipelines (``map_batches`` over zero-copy Arrow, actor
pools for stateful shards), NOT a port of the reference's process/message-bus
architecture.

Subpackages
-----------
functions/  pure vectorized kernels (urlnorm, fingerprint, partition, text)
sources/    fixture synthesis, readers, checkpoint manifest IO
stages/     stateless Dataset stages (canonicalize, extract, fetch-sim, schedule)
state/      stateful shards (cuckoo/bloom seen-set, politeness/robots)
pipelines/  the epoch-loop crawl driver and the pure-Python parity oracle
ops/        large-scale training-data ops (dedup, ANN, text analysis, multimodal)
"""

__version__ = "0.1.0"
