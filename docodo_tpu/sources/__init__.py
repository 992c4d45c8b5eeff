from docodo_tpu.sources.base import (  # noqa: F401
    IndexPage,
    IndexPagedTextFile,
    QueuedDataSource,
)
from docodo_tpu.sources.cache import IndexTextCacheDataSource  # noqa: F401
