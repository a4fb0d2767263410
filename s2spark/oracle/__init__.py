from .sql import (  # noqa: F401
    CELL_ID_FROM_LATLNG_CTES,
    encode_query,
    sql_cell_token,
    sql_parent_for_level,
)
