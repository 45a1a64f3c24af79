from setuptools import find_packages, setup

setup(
    name="neural_radiance_caching_tpu",
    version="0.1.0",
    description="TPU-native radiance-cache inverse rendering framework",
    packages=find_packages(exclude=("tests",)),
    python_requires=">=3.10",
)
