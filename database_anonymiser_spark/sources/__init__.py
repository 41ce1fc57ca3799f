"""Source/sink connectors (SURVEY.md §2.1).

The reference speaks only PostgreSQL (``src/db/postgres.client.ts:4-23``);
our native format is parquet, with CSV/JSON/ORC for interchange and JDBC as
the faithful-connector analogue of the reference's ``pg`` client.
"""

from database_anonymiser_spark.sources.connectors import (  # noqa: F401
    jdbc_reader,
    read_table,
    write_table,
)
