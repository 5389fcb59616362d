from hoopstat_haus_spark.tables.token_table import (  # noqa: F401
    TOKEN_TABLE_SCHEMA,
    from_documents,
    synthetic,
    token_sig,
    documents_token_sql,
)
