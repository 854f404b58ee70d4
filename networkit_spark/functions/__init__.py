from networkit_spark.functions.porthash import md5_mod, md5_mod_sql

__all__ = ["md5_mod", "md5_mod_sql"]
