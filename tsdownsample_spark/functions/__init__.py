from tsdownsample_spark.functions.codecs import (  # noqa: F401
    decode_dod,
    decode_gorilla,
    encode_dod,
    encode_gorilla,
)
