module github.com/usearch-tpu/usearch-tpu/golang

go 1.21
