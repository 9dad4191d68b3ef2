fn main() {
    // The C ABI library lives in ../c (build with `make -C ../c libusearch_tpu.so`).
    let dir = std::path::Path::new(env!("CARGO_MANIFEST_DIR")).join("../c");
    println!("cargo:rustc-link-search=native={}", dir.display());
    println!("cargo:rustc-link-lib=dylib=usearch_tpu");
}
