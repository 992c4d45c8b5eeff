from docodo_tpu.sources.base import (  # noqa: F401
    DataSource,
    IndexPage,
    IndexPagedTextFile,
    ListDataSource,
    QueuedDataSource,
)
from docodo_tpu.sources.cache import IndexTextCacheDataSource  # noqa: F401
from docodo_tpu.sources.db import (  # noqa: F401
    DBDataSourceBase,
    EntityDataSource,
    IndexType,
    SqliteDataSource,
)
from docodo_tpu.sources.files import (  # noqa: F401
    DocumentsDataSource,
    IndexedTextFile,
    IndexPDFDocument,
    IndexTextFilesDataSource,
    from_file,
)
from docodo_tpu.sources.web import WebDataSource, from_html, from_url  # noqa: F401
from docodo_tpu.sources.xmlsource import XmlDataSource  # noqa: F401
