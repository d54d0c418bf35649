def stack(*a, **kw):
    raise NotImplementedError("torch_complex stub")
