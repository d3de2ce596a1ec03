from psyndex2linkeddata_spark.datagen.pages import (  # noqa: F401
    make_records,
    pages_rows_from_records,
    write_pages_parquet,
)
from psyndex2linkeddata_spark.datagen.authorities import (  # noqa: F401
    write_authority_parquets,
)
