def wpe_one_iteration(*a, **kw):
    raise NotImplementedError("pytorch_wpe stub: WPE path unused")
