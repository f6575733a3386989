from .readers import load_table, ticks_from_events  # noqa: F401
