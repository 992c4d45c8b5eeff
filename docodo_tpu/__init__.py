"""docodo_tpu — a TPU-native documental full-text search engine framework.

A ground-up JAX/XLA/Pallas redesign with the capabilities of the reference
Docodo engine (C#/.NET): positional inverted index with morphological search,
proximity/phrase query algebra, ranking, snippets, data sources, CLI and REST
server — rebuilt as array programs: the index lives in device HBM as a
structure-of-arrays, and queries are batched, jit-compiled sort/segmented-scan
kernels instead of object graphs.

Layer map (mirrors reference layers, see SURVEY.md):
  core/      posting codec + page table + storage        (ref: IndexSequence.cs, Build.cs L1/L2)
  lang/      tokenizer, stemmers, vocabs, word coding    (ref: Dict.cs, Index.cs L4)
  ops/       device query kernels (sort/segment algebra) (ref: IndexSequence.cs operators, L6 hot path)
  query/     request parser + result pipeline            (ref: Search.cs L6)
  sources/   data sources: files/pdf/web/xml/db + cache  (ref: DataSources/* L3)
  parallel/  jax.sharding Mesh build + batched eval      (ref: thread-sharded build, L5)
  index.py   Index facade + Builder                      (ref: Index.cs L5)
  server.py / cli.py                                     (ref: server.cs, Program.cs L7)
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level exports so core/ modules import without the full stack
    if name in ("Index", "IndexBuilder", "SearchOptions"):
        from docodo_tpu import index as _index

        return getattr(_index, name)
    if name == "Vocab":
        from docodo_tpu.lang.vocab import Vocab

        return Vocab
    if name == "DeviceIndex":
        from docodo_tpu.ops.device_index import DeviceIndex

        return DeviceIndex
    if name == "BatchExecutor":
        from docodo_tpu.query.batcher import BatchExecutor

        return BatchExecutor
    if name == "DocodoServer":
        from docodo_tpu.server import DocodoServer

        return DocodoServer
    if name == "ShardedDeviceIndex":
        from docodo_tpu.parallel.serving import ShardedDeviceIndex

        return ShardedDeviceIndex
    raise AttributeError(name)
