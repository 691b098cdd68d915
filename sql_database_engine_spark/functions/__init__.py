"""Engine column-function library (JVM-side expressions only)."""

from .exact import money_sum, money_avg, cents, MONEY_SUM_SQL, MONEY_AVG_SQL  # noqa: F401
