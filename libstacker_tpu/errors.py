"""Error hierarchy mirroring the reference's ``StackerError`` enum.

Reference: ``src/lib.rs:28-45`` defines ``StackerError`` with variants
OpenCvError / NotEnoughFiles / NotImplemented / IoError / PoisonError /
InvalidPathEncoding / InvalidParams / ProcessingError.  In Python the
natural shape is an exception hierarchy rooted at :class:`StackerError`;
IO errors surface as ``StackerIoError`` (wrapping ``OSError``), and the
unused legacy variants (NotImplemented, PoisonError) are not carried over.
"""


class StackerError(Exception):
    """Base class for all libstacker_tpu errors (ref src/lib.rs:28)."""


class NotEnoughFilesError(StackerError):
    """No input files were provided (ref src/lib.rs:31-32)."""

    def __init__(self, msg: str = "Not enough files"):
        super().__init__(msg)


class InvalidParamsError(StackerError):
    """Invalid parameter(s) (ref src/lib.rs:41-42)."""

    def __init__(self, msg: str):
        super().__init__(f"Invalid parameter(s) {msg}")


class ProcessingError(StackerError):
    """Internal processing error (ref src/lib.rs:43-44)."""

    def __init__(self, msg: str):
        super().__init__(f"Internal error {msg}")


class StackerIoError(StackerError):
    """IO failure while reading image files (ref src/lib.rs:35-36)."""
