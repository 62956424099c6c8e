# submodules imported lazily to avoid import cycles during construction
