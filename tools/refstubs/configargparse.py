"""Minimal argparse-compatible stand-in for configargparse (shim for running
the reference model code without the real dependency)."""
import argparse as _ap


class YAMLConfigFileParser:  # placeholder type token
    pass


class ArgumentDefaultsHelpFormatter(_ap.ArgumentDefaultsHelpFormatter):
    pass


class ArgumentDefaultsRawTextHelpFormatter(_ap.ArgumentDefaultsHelpFormatter):
    pass


class ArgumentParser(_ap.ArgumentParser):
    def __init__(self, *a, **kw):
        kw.pop("config_file_parser_class", None)
        kw.pop("default_config_files", None)
        super().__init__(*a, **kw)

    def add_argument(self, *a, **kw):
        kw.pop("is_config_file", None)
        return super().add_argument(*a, **kw)

    def add(self, *a, **kw):
        return self.add_argument(*a, **kw)
