"""Column-expression library: every scalar helper is a pure Catalyst
expression (JVM-side, codegen-eligible) unless the docstring says pandas-UDF.
"""

from commoncrawl_fetcher_lite_spark.functions.urls import (  # noqa: F401
    clean_string,
    host_of,
    normalize_mime,
    tld_of,
    url_extension,
    url_hash,
)
from commoncrawl_fetcher_lite_spark.functions.paths import (  # noqa: F401
    rewrite_target_path,
    target_path_offsets,
)
from commoncrawl_fetcher_lite_spark.functions.sampling import sample_gate  # noqa: F401
from commoncrawl_fetcher_lite_spark.functions.digests import (  # noqa: F401
    sha1_base32,
    sha256_hex,
)
