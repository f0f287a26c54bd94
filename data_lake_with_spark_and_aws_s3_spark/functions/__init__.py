from .numeric import dec, money_sum  # noqa: F401
