from fea_large_tpu.elements.reference import (  # noqa: F401
    ElementType,
    TET4,
    TET10,
    get_element,
)
