from .catalog import BatchCatalog, CatalogError  # noqa: F401
from .writers import MergeWriter  # noqa: F401
from .maintenance import delete_column  # noqa: F401
