// Package usearch provides Go bindings for the usearch_tpu engine via its
// C ABI (c/usearch_tpu.h), the same layering the reference library uses for
// its Go binding (reference: golang/lib.go wraps c/usearch.h through cgo).
//
// Build: the shared library must be built first —
//
//	make -C ../c libusearch_tpu.so
//	CGO_CFLAGS="-I${SRCDIR}/../c" CGO_LDFLAGS="-L${SRCDIR}/../c -lusearch_tpu" go build
//
// NOTE: no Go toolchain ships in the development image this file was
// authored in; the binding is source-complete and mirrors the tested C
// smoke test (c/test.c) call-for-call, but has not itself been compiled.
package usearch

/*
#cgo CFLAGS: -I${SRCDIR}/../c
#cgo LDFLAGS: -L${SRCDIR}/../c -lusearch_tpu
#include <stdlib.h>
#include "usearch_tpu.h"
*/
import "C"

import (
	"errors"
	"fmt"
	"unsafe"
)

// Key is the 64-bit identifier attached to every vector
// (reference: c/usearch.h usearch_key_t).
type Key = uint64

// Metric enumerates the supported distance functions
// (reference: include/usearch/index_plugins.hpp metric_kind_t).
type Metric uint8

const (
	Cos Metric = iota
	InnerProduct
	L2sq
	Haversine
	Divergence
	Pearson
	Jaccard
	Hamming
	Tanimoto
	Sorensen
)

func (m Metric) c() C.usearch_metric_kind_t {
	switch m {
	case Cos:
		return C.usearch_metric_cos_k
	case InnerProduct:
		return C.usearch_metric_ip_k
	case L2sq:
		return C.usearch_metric_l2sq_k
	case Haversine:
		return C.usearch_metric_haversine_k
	case Divergence:
		return C.usearch_metric_divergence_k
	case Pearson:
		return C.usearch_metric_pearson_k
	case Jaccard:
		return C.usearch_metric_jaccard_k
	case Hamming:
		return C.usearch_metric_hamming_k
	case Tanimoto:
		return C.usearch_metric_tanimoto_k
	case Sorensen:
		return C.usearch_metric_sorensen_k
	}
	return C.usearch_metric_unknown_k
}

// Quantization enumerates on-device storage dtypes
// (reference: include/usearch/index_plugins.hpp scalar_kind_t subset).
type Quantization uint8

const (
	F32 Quantization = iota
	F64
	F16
	BF16
	I8
	B1
)

func (q Quantization) c() C.usearch_scalar_kind_t {
	switch q {
	case F32:
		return C.usearch_scalar_f32_k
	case F64:
		return C.usearch_scalar_f64_k
	case F16:
		return C.usearch_scalar_f16_k
	case BF16:
		return C.usearch_scalar_bf16_k
	case I8:
		return C.usearch_scalar_i8_k
	case B1:
		return C.usearch_scalar_b1_k
	}
	return C.usearch_scalar_unknown_k
}

// IndexConfig mirrors usearch_init_options_t (c/usearch_tpu.h:57).
type IndexConfig struct {
	Quantization    Quantization
	Metric          Metric
	Dimensions      uint
	Connectivity    uint
	ExpansionAdd    uint
	ExpansionSearch uint
	Multi           bool
}

// DefaultConfig mirrors the engine defaults (connectivity 16,
// expansion_add 128, expansion_search 64 — usearch_tpu/enums.py, matching
// reference index.hpp:1340-1350).
func DefaultConfig(dimensions uint) IndexConfig {
	return IndexConfig{
		Quantization: F32,
		Metric:       Cos,
		Dimensions:   dimensions,
	}
}

// Index is a handle on one usearch_tpu dense index. Not safe for concurrent
// use from multiple goroutines without external synchronization — the C
// layer serializes on the embedded interpreter anyway (c/lib.cpp).
type Index struct {
	handle C.usearch_index_t
	config IndexConfig
}

func lastError(e C.usearch_error_t) error {
	if e == nil {
		return nil
	}
	return errors.New(C.GoString(e))
}

// NewIndex constructs an empty index (reference: golang/lib.go NewIndex).
func NewIndex(conf IndexConfig) (*Index, error) {
	opts := C.usearch_init_options_t{
		metric_kind:      conf.Metric.c(),
		quantization:     conf.Quantization.c(),
		dimensions:       C.size_t(conf.Dimensions),
		connectivity:     C.size_t(conf.Connectivity),
		expansion_add:    C.size_t(conf.ExpansionAdd),
		expansion_search: C.size_t(conf.ExpansionSearch),
		multi:            C.bool(conf.Multi),
	}
	var cerr C.usearch_error_t
	h := C.usearch_init(&opts, &cerr)
	if err := lastError(cerr); err != nil {
		return nil, err
	}
	return &Index{handle: h, config: conf}, nil
}

// Destroy releases the native index. Idempotent.
func (ix *Index) Destroy() error {
	if ix.handle == nil {
		return nil
	}
	var cerr C.usearch_error_t
	C.usearch_free(ix.handle, &cerr)
	ix.handle = nil
	return lastError(cerr)
}

// Close implements io.Closer.
func (ix *Index) Close() error { return ix.Destroy() }

func (ix *Index) checkDims(n int) error {
	if uint(n) != ix.config.Dimensions {
		return fmt.Errorf("vector has %d dimensions, index expects %d", n, ix.config.Dimensions)
	}
	return nil
}

// Len returns the number of stored vectors.
func (ix *Index) Len() (uint, error) {
	var cerr C.usearch_error_t
	n := C.usearch_size(ix.handle, &cerr)
	return uint(n), lastError(cerr)
}

// Capacity returns the reserved row capacity.
func (ix *Index) Capacity() (uint, error) {
	var cerr C.usearch_error_t
	n := C.usearch_capacity(ix.handle, &cerr)
	return uint(n), lastError(cerr)
}

// Dimensions returns the configured vector width.
func (ix *Index) Dimensions() (uint, error) {
	var cerr C.usearch_error_t
	n := C.usearch_dimensions(ix.handle, &cerr)
	return uint(n), lastError(cerr)
}

// Connectivity returns the configured connectivity hyper-parameter.
func (ix *Index) Connectivity() (uint, error) {
	var cerr C.usearch_error_t
	n := C.usearch_connectivity(ix.handle, &cerr)
	return uint(n), lastError(cerr)
}

// SerializedLength returns the exact byte size Save/SaveBuffer will emit.
func (ix *Index) SerializedLength() (uint, error) {
	var cerr C.usearch_error_t
	n := C.usearch_serialized_length(ix.handle, &cerr)
	return uint(n), lastError(cerr)
}

// MemoryUsage estimates resident bytes (host + device mirrors).
func (ix *Index) MemoryUsage() (uint, error) {
	var cerr C.usearch_error_t
	n := C.usearch_memory_usage(ix.handle, &cerr)
	return uint(n), lastError(cerr)
}

// HardwareAcceleration names the active backend kernel ISA (e.g. "tpu").
func (ix *Index) HardwareAcceleration() (string, error) {
	var cerr C.usearch_error_t
	s := C.usearch_hardware_acceleration(ix.handle, &cerr)
	return C.GoString(s), lastError(cerr)
}

// Reserve pre-allocates capacity for at least `capacity` rows.
func (ix *Index) Reserve(capacity uint) error {
	var cerr C.usearch_error_t
	C.usearch_reserve(ix.handle, C.size_t(capacity), &cerr)
	return lastError(cerr)
}

// ExpansionAdd returns the insertion-time candidate budget.
func (ix *Index) ExpansionAdd() (uint, error) {
	var cerr C.usearch_error_t
	n := C.usearch_expansion_add(ix.handle, &cerr)
	return uint(n), lastError(cerr)
}

// ExpansionSearch returns the query-time candidate budget.
func (ix *Index) ExpansionSearch() (uint, error) {
	var cerr C.usearch_error_t
	n := C.usearch_expansion_search(ix.handle, &cerr)
	return uint(n), lastError(cerr)
}

// ChangeExpansionAdd updates the insertion-time candidate budget.
func (ix *Index) ChangeExpansionAdd(v uint) error {
	var cerr C.usearch_error_t
	C.usearch_change_expansion_add(ix.handle, C.size_t(v), &cerr)
	return lastError(cerr)
}

// ChangeExpansionSearch updates the query-time candidate budget
// (drives the IVF probe count — usearch_tpu/ivf.py nprobe_for).
func (ix *Index) ChangeExpansionSearch(v uint) error {
	var cerr C.usearch_error_t
	C.usearch_change_expansion_search(ix.handle, C.size_t(v), &cerr)
	return lastError(cerr)
}

// ChangeMetricKind switches the live index's distance function.
func (ix *Index) ChangeMetricKind(m Metric) error {
	var cerr C.usearch_error_t
	C.usearch_change_metric_kind(ix.handle, m.c(), &cerr)
	return lastError(cerr)
}

// ChangeThreadsAdd is accepted for API compatibility; XLA schedules the
// actual device parallelism.
func (ix *Index) ChangeThreadsAdd(threads uint) error {
	var cerr C.usearch_error_t
	C.usearch_change_threads_add(ix.handle, C.size_t(threads), &cerr)
	return lastError(cerr)
}

// ChangeThreadsSearch is accepted for API compatibility.
func (ix *Index) ChangeThreadsSearch(threads uint) error {
	var cerr C.usearch_error_t
	C.usearch_change_threads_search(ix.handle, C.size_t(threads), &cerr)
	return lastError(cerr)
}

// Add inserts one f32 vector under `key`.
func (ix *Index) Add(key Key, vec []float32) error {
	if err := ix.checkDims(len(vec)); err != nil {
		return err
	}
	var cerr C.usearch_error_t
	C.usearch_add(ix.handle, C.usearch_key_t(key), unsafe.Pointer(&vec[0]),
		C.usearch_scalar_f32_k, &cerr)
	return lastError(cerr)
}

// AddI8 inserts one pre-quantized i8 vector under `key`.
func (ix *Index) AddI8(key Key, vec []int8) error {
	if err := ix.checkDims(len(vec)); err != nil {
		return err
	}
	var cerr C.usearch_error_t
	C.usearch_add(ix.handle, C.usearch_key_t(key), unsafe.Pointer(&vec[0]),
		C.usearch_scalar_i8_k, &cerr)
	return lastError(cerr)
}

// AddF64 inserts one f64 vector under `key`.
func (ix *Index) AddF64(key Key, vec []float64) error {
	if err := ix.checkDims(len(vec)); err != nil {
		return err
	}
	var cerr C.usearch_error_t
	C.usearch_add(ix.handle, C.usearch_key_t(key), unsafe.Pointer(&vec[0]),
		C.usearch_scalar_f64_k, &cerr)
	return lastError(cerr)
}

// Contains reports whether any vector is stored under `key`.
func (ix *Index) Contains(key Key) (bool, error) {
	var cerr C.usearch_error_t
	found := C.usearch_contains(ix.handle, C.usearch_key_t(key), &cerr)
	return bool(found), lastError(cerr)
}

// Count returns how many vectors are stored under `key` (multi-indexes may
// hold several).
func (ix *Index) Count(key Key) (uint, error) {
	var cerr C.usearch_error_t
	n := C.usearch_count(ix.handle, C.usearch_key_t(key), &cerr)
	return uint(n), lastError(cerr)
}

// Search returns up to `limit` nearest keys with distances.
func (ix *Index) Search(query []float32, limit uint) ([]Key, []float32, error) {
	if err := ix.checkDims(len(query)); err != nil {
		return nil, nil, err
	}
	if limit == 0 {
		return nil, nil, nil
	}
	keys := make([]Key, limit)
	dists := make([]float32, limit)
	var cerr C.usearch_error_t
	n := C.usearch_search(ix.handle, unsafe.Pointer(&query[0]), C.usearch_scalar_f32_k,
		C.size_t(limit), (*C.usearch_key_t)(unsafe.Pointer(&keys[0])),
		(*C.usearch_distance_t)(unsafe.Pointer(&dists[0])), &cerr)
	if err := lastError(cerr); err != nil {
		return nil, nil, err
	}
	return keys[:n], dists[:n], nil
}

// SearchI8 searches with a pre-quantized i8 query.
func (ix *Index) SearchI8(query []int8, limit uint) ([]Key, []float32, error) {
	if err := ix.checkDims(len(query)); err != nil {
		return nil, nil, err
	}
	if limit == 0 {
		return nil, nil, nil
	}
	keys := make([]Key, limit)
	dists := make([]float32, limit)
	var cerr C.usearch_error_t
	n := C.usearch_search(ix.handle, unsafe.Pointer(&query[0]), C.usearch_scalar_i8_k,
		C.size_t(limit), (*C.usearch_key_t)(unsafe.Pointer(&keys[0])),
		(*C.usearch_distance_t)(unsafe.Pointer(&dists[0])), &cerr)
	if err := lastError(cerr); err != nil {
		return nil, nil, err
	}
	return keys[:n], dists[:n], nil
}

// FilteredSearch restricts results to `allowed` keys
// (reference: c/usearch.h filtered search, :391). An EMPTY allow-list
// allows nothing and returns no results; use Search for an unfiltered
// query.
func (ix *Index) FilteredSearch(query []float32, limit uint, allowed []Key) ([]Key, []float32, error) {
	if err := ix.checkDims(len(query)); err != nil {
		return nil, nil, err
	}
	if limit == 0 || len(allowed) == 0 {
		// an empty allow-list excludes every key: passing NULL to the C
		// layer would mean "no filter" and silently return unfiltered
		// results — the opposite of what the caller asked for
		return nil, nil, nil
	}
	keys := make([]Key, limit)
	dists := make([]float32, limit)
	allowedPtr := (*C.usearch_key_t)(unsafe.Pointer(&allowed[0]))
	var cerr C.usearch_error_t
	n := C.usearch_filtered_search(ix.handle, unsafe.Pointer(&query[0]),
		C.usearch_scalar_f32_k, C.size_t(limit), allowedPtr, C.size_t(len(allowed)),
		(*C.usearch_key_t)(unsafe.Pointer(&keys[0])),
		(*C.usearch_distance_t)(unsafe.Pointer(&dists[0])), &cerr)
	if err := lastError(cerr); err != nil {
		return nil, nil, err
	}
	return keys[:n], dists[:n], nil
}

// Get copies up to `count` vectors stored under `key`, as f32 rows.
func (ix *Index) Get(key Key, count uint) ([]float32, error) {
	if count == 0 {
		return nil, nil
	}
	buf := make([]float32, uint(ix.config.Dimensions)*count)
	var cerr C.usearch_error_t
	n := C.usearch_get(ix.handle, C.usearch_key_t(key), C.size_t(count),
		unsafe.Pointer(&buf[0]), C.usearch_scalar_f32_k, &cerr)
	if err := lastError(cerr); err != nil {
		return nil, err
	}
	if n == 0 {
		return nil, nil
	}
	return buf[:uint(n)*ix.config.Dimensions], nil
}

// Remove deletes all vectors under `key`; returns how many were removed.
func (ix *Index) Remove(key Key) (uint, error) {
	var cerr C.usearch_error_t
	n := C.usearch_remove(ix.handle, C.usearch_key_t(key), &cerr)
	return uint(n), lastError(cerr)
}

// Rename moves vectors from key `from` to key `to`; returns how many moved.
func (ix *Index) Rename(from, to Key) (uint, error) {
	var cerr C.usearch_error_t
	n := C.usearch_rename(ix.handle, C.usearch_key_t(from), C.usearch_key_t(to), &cerr)
	return uint(n), lastError(cerr)
}

// Clear drops all vectors, keeping the configuration.
func (ix *Index) Clear() error {
	var cerr C.usearch_error_t
	C.usearch_clear(ix.handle, &cerr)
	return lastError(cerr)
}

// Save writes the index to `path` (format: usearch_tpu/persist.py).
func (ix *Index) Save(path string) error {
	cpath := C.CString(path)
	defer C.free(unsafe.Pointer(cpath))
	var cerr C.usearch_error_t
	C.usearch_save(ix.handle, cpath, &cerr)
	return lastError(cerr)
}

// refreshConfig re-reads engine-side geometry after load/view: the file's
// configuration replaces the constructor's (dimensions may differ).
func (ix *Index) refreshConfig() error {
	var cerr C.usearch_error_t
	d := C.usearch_dimensions(ix.handle, &cerr)
	if err := lastError(cerr); err != nil {
		return err
	}
	ix.config.Dimensions = uint(d)
	return nil
}

// Load reads an index previously written by Save.
func (ix *Index) Load(path string) error {
	cpath := C.CString(path)
	defer C.free(unsafe.Pointer(cpath))
	var cerr C.usearch_error_t
	C.usearch_load(ix.handle, cpath, &cerr)
	if err := lastError(cerr); err != nil {
		return err
	}
	return ix.refreshConfig()
}

// View memory-maps an index file (zero host copies; streamed to device on
// first search).
func (ix *Index) View(path string) error {
	cpath := C.CString(path)
	defer C.free(unsafe.Pointer(cpath))
	var cerr C.usearch_error_t
	C.usearch_view(ix.handle, cpath, &cerr)
	if err := lastError(cerr); err != nil {
		return err
	}
	return ix.refreshConfig()
}

// SaveBuffer serializes into a caller-owned buffer of SerializedLength bytes.
func (ix *Index) SaveBuffer(buf []byte) error {
	var cerr C.usearch_error_t
	C.usearch_save_buffer(ix.handle, unsafe.Pointer(&buf[0]), C.size_t(len(buf)), &cerr)
	return lastError(cerr)
}

// LoadBuffer restores from an in-memory serialized index.
func (ix *Index) LoadBuffer(buf []byte) error {
	var cerr C.usearch_error_t
	C.usearch_load_buffer(ix.handle, unsafe.Pointer(&buf[0]), C.size_t(len(buf)), &cerr)
	if err := lastError(cerr); err != nil {
		return err
	}
	return ix.refreshConfig()
}

// ViewBuffer restores from an in-memory serialized index (the engine owns
// device/host mirrors, so no lifetime is imposed on `buf`).
func (ix *Index) ViewBuffer(buf []byte) error {
	var cerr C.usearch_error_t
	C.usearch_view_buffer(ix.handle, unsafe.Pointer(&buf[0]), C.size_t(len(buf)), &cerr)
	if err := lastError(cerr); err != nil {
		return err
	}
	return ix.refreshConfig()
}

// Metadata sniffs an index file's configuration without loading vectors
// (reference: c/usearch.h:186 usearch_metadata).
func Metadata(path string) (IndexConfig, error) {
	cpath := C.CString(path)
	defer C.free(unsafe.Pointer(cpath))
	var opts C.usearch_init_options_t
	var cerr C.usearch_error_t
	C.usearch_metadata(cpath, &opts, &cerr)
	if err := lastError(cerr); err != nil {
		return IndexConfig{}, err
	}
	return configFromOptions(opts), nil
}

// MetadataBuffer sniffs a serialized index buffer's configuration.
func MetadataBuffer(buf []byte) (IndexConfig, error) {
	var opts C.usearch_init_options_t
	var cerr C.usearch_error_t
	C.usearch_metadata_buffer(unsafe.Pointer(&buf[0]), C.size_t(len(buf)), &opts, &cerr)
	if err := lastError(cerr); err != nil {
		return IndexConfig{}, err
	}
	return configFromOptions(opts), nil
}

func configFromOptions(opts C.usearch_init_options_t) IndexConfig {
	conf := IndexConfig{
		Dimensions:      uint(opts.dimensions),
		Connectivity:    uint(opts.connectivity),
		ExpansionAdd:    uint(opts.expansion_add),
		ExpansionSearch: uint(opts.expansion_search),
		Multi:           bool(opts.multi),
	}
	switch opts.metric_kind {
	case C.usearch_metric_cos_k:
		conf.Metric = Cos
	case C.usearch_metric_ip_k:
		conf.Metric = InnerProduct
	case C.usearch_metric_l2sq_k:
		conf.Metric = L2sq
	case C.usearch_metric_haversine_k:
		conf.Metric = Haversine
	case C.usearch_metric_divergence_k:
		conf.Metric = Divergence
	case C.usearch_metric_pearson_k:
		conf.Metric = Pearson
	case C.usearch_metric_jaccard_k:
		conf.Metric = Jaccard
	case C.usearch_metric_hamming_k:
		conf.Metric = Hamming
	case C.usearch_metric_tanimoto_k:
		conf.Metric = Tanimoto
	case C.usearch_metric_sorensen_k:
		conf.Metric = Sorensen
	}
	switch opts.quantization {
	case C.usearch_scalar_f32_k:
		conf.Quantization = F32
	case C.usearch_scalar_f64_k:
		conf.Quantization = F64
	case C.usearch_scalar_f16_k:
		conf.Quantization = F16
	case C.usearch_scalar_bf16_k:
		conf.Quantization = BF16
	case C.usearch_scalar_i8_k:
		conf.Quantization = I8
	case C.usearch_scalar_b1_k:
		conf.Quantization = B1
	}
	return conf
}

// Distance computes one pairwise distance without an index
// (reference: c/usearch.h usearch_distance).
func Distance(a, b []float32, metric Metric) (float32, error) {
	if len(a) != len(b) {
		return 0, fmt.Errorf("dimension mismatch: %d vs %d", len(a), len(b))
	}
	var cerr C.usearch_error_t
	d := C.usearch_distance(unsafe.Pointer(&a[0]), unsafe.Pointer(&b[0]),
		C.usearch_scalar_f32_k, C.size_t(len(a)), metric.c(), &cerr)
	return float32(d), lastError(cerr)
}

// ExactSearch brute-force scans a row-major f32 dataset
// (reference: c/usearch.h:467 usearch_exact_search; row index = key).
func ExactSearch(dataset []float32, rows, dims uint, queries []float32, nq uint,
	limit uint, metric Metric) ([]Key, []float32, error) {
	if uint(len(dataset)) < rows*dims || uint(len(queries)) < nq*dims {
		return nil, nil, errors.New("dataset/queries shorter than rows*dims")
	}
	keys := make([]Key, nq*limit)
	dists := make([]float32, nq*limit)
	var cerr C.usearch_error_t
	C.usearch_exact_search(
		unsafe.Pointer(&dataset[0]), C.size_t(rows), C.size_t(dims*4),
		unsafe.Pointer(&queries[0]), C.size_t(nq), C.size_t(dims*4),
		C.usearch_scalar_f32_k, C.size_t(dims), metric.c(), C.size_t(limit),
		C.size_t(0),
		(*C.usearch_key_t)(unsafe.Pointer(&keys[0])), C.size_t(limit*8),
		(*C.usearch_distance_t)(unsafe.Pointer(&dists[0])), C.size_t(limit*4),
		&cerr)
	if err := lastError(cerr); err != nil {
		return nil, nil, err
	}
	return keys, dists, nil
}

// Version reports the engine version string.
func Version() string {
	return C.GoString(C.usearch_version())
}
