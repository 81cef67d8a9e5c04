"""Query modules. Importing a module registers its queries (see
programmers_data_spark.registry)."""
