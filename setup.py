from setuptools import setup, find_packages

setup(
    name="modular_semantic_segmentation_tpu",
    version="0.1.0",
    description=("TPU-native modular sensor fusion for semantic "
                 "segmentation (JAX/XLA/Pallas)"),
    packages=find_packages(
        include=["modular_semantic_segmentation_tpu",
                 "modular_semantic_segmentation_tpu.*", "experiments"]),
    python_requires=">=3.10",
    install_requires=[
        "jax", "optax", "numpy", "scipy", "scikit-learn", "opencv-python",
        "pyyaml", "pandas", "tqdm",
    ],
    package_data={
        "modular_semantic_segmentation_tpu": ["native/Makefile",
                                              "native/*.cc"],
    },
)
