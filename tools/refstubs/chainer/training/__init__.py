from . import extension, util
