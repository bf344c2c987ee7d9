from .catalog import load_table, local_rows_df, register_views

__all__ = ["load_table", "register_views"]
