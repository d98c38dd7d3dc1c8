from .semirings import LOG_SUM_EXP, MAX_PRODUCT, SEMIRINGS, SUM_PRODUCT, Semiring

__all__ = ["Semiring", "SUM_PRODUCT", "LOG_SUM_EXP", "MAX_PRODUCT", "SEMIRINGS"]
