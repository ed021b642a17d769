from .registry import TableDef, TableRegistry  # noqa: F401
from .quality import CheckResult, DQSuite, contract_checks  # noqa: F401
