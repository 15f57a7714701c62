from .serialize import (  # noqa: F401
    csv_column_order,
    objects_csv_ds,
    pages_json_ds,
    write_objects_csv,
)
