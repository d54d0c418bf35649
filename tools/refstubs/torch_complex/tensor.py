class ComplexTensor:
    def __init__(self, *a, **kw):
        raise NotImplementedError("torch_complex stub: frontend path unused")
