"""Build script — exists only to compile the native C++ extension
(native/png_decode.cc → scenedepthestimation_tpu._native); all metadata
lives in pyproject.toml. The extension is OPTIONAL: data/io.py falls
back to PIL when it is absent, so a pure-Python install still works."""

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
    """Never fail the install over the optional native extension."""

    def run(self):
        try:
            super().run()
        except Exception as e:  # pragma: no cover
            print(f"WARNING: native extension build failed ({e}); "
                  f"falling back to PIL decode")

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as e:  # pragma: no cover
            print(f"WARNING: building {ext.name} failed ({e})")


setup(
    ext_modules=[
        Extension(
            "scenedepthestimation_tpu._native",
            sources=["native/png_decode.cc"],
            libraries=["deflate"],
            extra_compile_args=["-O3", "-std=c++17", "-fvisibility=hidden"],
        )
    ],
    cmdclass={"build_ext": OptionalBuildExt},
)
