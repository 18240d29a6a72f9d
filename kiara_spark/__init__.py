"""kiara_spark — a PySpark-native analytics/orchestration engine with the
capabilities of DHARPA-Project/kiara (reference surveyed in SURVEY.md).

Public surface:
    from kiara_spark import KiaraContext, build_spark
    ctx = KiaraContext()                       # own SparkSession
    ctx.run_job("table.query.sql", {...})      # named operations
"""

from .context import KiaraContext
from .session import build_spark
from .values import Value, ValueMap, ValueSchema
from .workflow import Workflow

__all__ = ["KiaraContext", "Workflow", "build_spark", "Value", "ValueMap", "ValueSchema"]
__version__ = "0.1.0"
