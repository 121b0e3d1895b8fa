"""Sources: file-tree scan, lenient readers, struct-text parser,
fixed-format report parser, label/category dimension loaders."""
