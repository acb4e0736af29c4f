from .build import FulltextIndex, build_index, build_positional  # noqa: F401
