from .spanify import spanify_documents  # noqa: F401
from .loaders import load_table  # noqa: F401
