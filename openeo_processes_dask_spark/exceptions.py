"""The OpenEO exception hierarchy (reference:
process_implementations/exceptions.py:1-117) — the full set of error
types a reference user catches, under the same ``OpenEOException`` base
so ``except OpenEOException`` migrates unchanged.

Operator modules historically defined their classes locally; those names
now ALIAS the classes here (same object identity), so both
``from operators.merge import OverlapResolverMissing`` and
``from exceptions import OverlapResolverMissing`` catch the same type.
"""


class OpenEOException(Exception):
    pass


class DimensionLabelCountMismatch(OpenEOException):
    pass


class ArrayElementParameterConflict(OpenEOException):
    pass


class ArrayElementParameterMissing(OpenEOException):
    pass


class ArrayNotLabeled(OpenEOException):
    pass


class ArrayElementNotAvailable(OpenEOException):
    pass


class ArrayLabelConflict(OpenEOException):
    pass


class ArrayLengthMismatch(OpenEOException):
    pass


class LabelExists(OpenEOException):
    pass


class TooManyDimensions(OpenEOException):
    pass


class ProcessParameterMissing(OpenEOException):
    pass


class ModelNotFoundException(OpenEOException):
    pass


class DimensionNotAvailable(OpenEOException):
    pass


class OverlapResolverMissing(OpenEOException):
    pass


class QuantilesParameterMissing(OpenEOException):
    pass


class QuantilesParameterConflict(OpenEOException):
    pass


class DimensionMissing(OpenEOException):
    pass


class BandFilterParameterMissing(OpenEOException):
    pass


class NoDataAvailable(OpenEOException):
    pass


class TemporalExtentEmpty(OpenEOException):
    pass


class DimensionAmbiguous(OpenEOException):
    pass


class NirBandAmbiguous(OpenEOException):
    pass


class RedBandAmbiguous(OpenEOException):
    pass


class BandExists(OpenEOException):
    pass


class DimensionMismatch(OpenEOException):
    pass


class LabelMismatch(OpenEOException):
    pass


class KernelDimensionsUneven(OpenEOException):
    pass


class MinMaxSwapped(OpenEOException):
    pass


class UnitMismatch(OpenEOException):
    pass


# engine-specific (no reference counterpart, same base)
class LabelsNotEnumerated(OpenEOException):
    pass


class DimensionAlreadyExists(OpenEOException):
    pass


class IrregularAxisTooLarge(OpenEOException):
    """A spatial axis failed the regular-grid probe AND has more
    distinct labels than the bounded driver-side fallback allows —
    resampling needs an explicit target grid in that case."""
