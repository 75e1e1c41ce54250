from blurrily_spark.operators.find import find, find_one, knn_join  # noqa: F401
from blurrily_spark.operators.index import (  # noqa: F401
    append_postings,
    build_postings,
    delete_refs,
    prepare_needles,
    stats,
)
