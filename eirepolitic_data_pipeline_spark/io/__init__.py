from .catalog import BatchCatalog, CatalogError  # noqa: F401
from .writers import MergeWriter  # noqa: F401
