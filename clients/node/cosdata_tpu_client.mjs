/**
 * Minimal Node.js SDK for the cosdata_tpu REST API.
 *
 * Mirrors the Python SDK (clients/python/cosdata_tpu_client.py) and the
 * reference's client layer (SURVEY.md §1: "Python SDK / Node SDK / curl").
 * Zero dependencies — uses the global fetch available in Node >= 18.
 *
 * Usage:
 *   import { Client } from "./cosdata_tpu_client.mjs";
 *
 *   const c = new Client("127.0.0.1:8443", { adminKey: "..." });
 *   await c.connect();
 *   await c.createCollection("docs", { denseDimension: 768 });
 *   await c.createDenseIndex("docs");
 *   const txn = await c.transaction("docs");
 *   try {
 *     await txn.upsert([{ id: "a", dense_values: [...] }]);
 *     await txn.commit();
 *   } catch (e) {
 *     await txn.abort();
 *     throw e;
 *   }
 *   await c.waitForIndexing("docs");
 *   const hits = await c.searchDense("docs", [...], { topK: 10 });
 */

export class ClientError extends Error {
  constructor(status, message) {
    super(`HTTP ${status}: ${message}`);
    this.status = status;
  }
}

export class Transaction {
  constructor(client, collection, txnId) {
    this._c = client;
    this.collection = collection;
    this.txnId = txnId;
  }

  _base() {
    return `/vectordb/collections/${this.collection}/transactions/${this.txnId}`;
  }

  insert(vectors) {
    return this._c._post(`${this._base()}/vectors`, vectors);
  }

  upsert(vectors) {
    return this._c._post(`${this._base()}/upsert`, { vectors });
  }

  delete(vectorId) {
    return this._c._delete(`${this._base()}/vectors/${vectorId}`);
  }

  async commit() {
    const out = await this._c._post(`${this._base()}/commit`, {});
    return out.version;
  }

  abort() {
    return this._c._post(`${this._base()}/abort`, {});
  }

  status() {
    return this._c._get(`${this._base()}/status`);
  }
}

export class Client {
  /**
   * @param {string} host "host:port"
   * @param {{adminKey?: string, username?: string, https?: boolean}} opts
   */
  constructor(host = "127.0.0.1:8443", opts = {}) {
    const scheme = opts.https ? "https" : "http";
    this.base = `${scheme}://${host}`;
    this.username = opts.username ?? "admin";
    this.adminKey = opts.adminKey ?? "";
    this.token = null;
  }

  /** POST /auth/create-session and store the bearer token. */
  async connect() {
    const out = await this._req("POST", "/auth/create-session", {
      username: this.username,
      password: this.adminKey,
    });
    this.token = out.access_token;
    return out;
  }

  async _req(method, path, body) {
    const headers = { "content-type": "application/json" };
    if (this.token) headers.authorization = `Bearer ${this.token}`;
    const resp = await fetch(this.base + path, {
      method,
      headers,
      body: body === undefined ? undefined : JSON.stringify(body),
    });
    const text = await resp.text();
    if (!resp.ok) throw new ClientError(resp.status, text);
    return text ? JSON.parse(text) : null;
  }

  async _authed(method, path, body) {
    if (!this.token) await this.connect();
    return this._req(method, path, body);
  }

  _get(path) {
    return this._authed("GET", path);
  }

  _post(path, body) {
    return this._authed("POST", path, body);
  }

  _delete(path) {
    return this._authed("DELETE", path);
  }

  // ---- collections ----

  createCollection(
    name,
    {
      denseDimension = null,
      sparse = false,
      tfIdf = false,
      description = null,
      metadataSchema = null,
      storeRawText = false,
    } = {},
  ) {
    const body = {
      name,
      description,
      dense_vector: {
        enabled: denseDimension != null,
        dimension: denseDimension ?? 0,
      },
      sparse_vector: { enabled: sparse },
      tf_idf_options: { enabled: tfIdf },
      store_raw_text: storeRawText,
    };
    if (metadataSchema) body.metadata_schema = metadataSchema;
    return this._post("/vectordb/collections", body);
  }

  listCollections() {
    return this._get("/vectordb/collections");
  }

  getCollection(name) {
    return this._get(`/vectordb/collections/${name}`);
  }

  deleteCollection(name) {
    return this._delete(`/vectordb/collections/${name}`);
  }

  loadedCollections() {
    return this._get("/vectordb/collections/loaded");
  }

  loadCollection(name) {
    return this._post(`/vectordb/collections/${name}/load`, {});
  }

  unloadCollection(name) {
    return this._post(`/vectordb/collections/${name}/unload`, {});
  }

  indexingStatus(name) {
    return this._get(`/vectordb/collections/${name}/indexing_status`);
  }

  async waitForIndexing(name, timeoutMs = 600000, pollMs = 250) {
    const deadline = Date.now() + timeoutMs;
    for (;;) {
      const st = await this.indexingStatus(name);
      if (
        st.status_counts.in_progress === 0 &&
        st.background_version >= st.current_version
      )
        return st;
      if (Date.now() > deadline)
        throw new ClientError(408, `indexing timeout for ${name}`);
      await new Promise((r) => setTimeout(r, pollMs));
    }
  }

  // ---- indexes ----

  createDenseIndex(
    collection,
    {
      distanceMetric = "cosine",
      quantization = null,
      hnswParams = null,
      rawStorage = "device", // "device" | "host" | "none"
    } = {},
  ) {
    return this._post(`/vectordb/collections/${collection}/indexes/dense`, {
      distance_metric_type: distanceMetric,
      quantization: quantization ?? { type: "auto", sample_threshold: 100 },
      hnsw_params: hnswParams ?? {},
      raw_storage: rawStorage,
    });
  }

  createSparseIndex(collection, { quantization = 64, sampleThreshold = 1000 } = {}) {
    return this._post(`/vectordb/collections/${collection}/indexes/sparse`, {
      quantization,
      sample_threshold: sampleThreshold,
    });
  }

  createTfIdfIndex(collection, { k1 = 1.2, b = 0.75, sampleThreshold = 1000 } = {}) {
    return this._post(`/vectordb/collections/${collection}/indexes/tf-idf`, {
      k1,
      b,
      sample_threshold: sampleThreshold,
    });
  }

  listIndexes(collection) {
    return this._get(`/vectordb/collections/${collection}/indexes`);
  }

  deleteIndex(collection, indexType) {
    return this._delete(`/vectordb/collections/${collection}/indexes/${indexType}`);
  }

  // ---- transactions / streaming ----

  async transaction(collection) {
    const out = await this._post(
      `/vectordb/collections/${collection}/transactions`,
      {},
    );
    return new Transaction(this, collection, out.transaction_id);
  }

  streamUpsert(collection, vectors) {
    return this._post(`/vectordb/collections/${collection}/streaming/upsert`, {
      vectors,
    });
  }

  streamDelete(collection, vectorId) {
    return this._delete(
      `/vectordb/collections/${collection}/streaming/vectors/${vectorId}`,
    );
  }

  // ---- search ----

  searchDense(collection, queryVector, { topK = 10, filter = null, returnRawText = false } = {}) {
    const body = { query_vector: queryVector, top_k: topK, return_raw_text: returnRawText };
    if (filter) body.filter = filter;
    return this._post(`/vectordb/collections/${collection}/search/dense`, body);
  }

  batchSearchDense(collection, queryVectors, { topK = 10 } = {}) {
    return this._post(`/vectordb/collections/${collection}/search/batch-dense`, {
      queries: queryVectors.map((v) => ({ vector: v })),
      top_k: topK,
    });
  }

  searchSparse(collection, queryTerms, { topK = 10, earlyTerminateThreshold } = {}) {
    // omit the threshold when unset: sending 0.0 would OVERRIDE the
    // index-configured value and force the serializing per-request path
    const body = { query_terms: queryTerms, top_k: topK };
    if (earlyTerminateThreshold !== undefined) {
      body.early_terminate_threshold = earlyTerminateThreshold;
    }
    return this._post(`/vectordb/collections/${collection}/search/sparse`, body);
  }

  batchSearchSparse(collection, queries, { topK = 10 } = {}) {
    return this._post(`/vectordb/collections/${collection}/search/batch-sparse`, {
      query_terms_list: queries,
      top_k: topK,
    });
  }

  searchTfIdf(collection, query, { topK = 10 } = {}) {
    return this._post(`/vectordb/collections/${collection}/search/tf-idf`, {
      query,
      top_k: topK,
    });
  }

  batchSearchTfIdf(collection, queries, { topK = 10 } = {}) {
    return this._post(`/vectordb/collections/${collection}/search/batch-tf-idf`, {
      queries,
      top_k: topK,
    });
  }

  /**
   * Hybrid RRF search. Pass any two of {queryVector, queryTerms, queryText}.
   * fusionConstantK matches the reference default 60 (search/repo.rs:168-341).
   */
  searchHybrid(
    collection,
    {
      topK = 10,
      queryVector = null,
      queryTerms = null,
      queryText = null,
      fusionConstantK = 60,
      sparseEarlyTerminateThreshold = null,
    } = {},
  ) {
    const body = { top_k: topK, fusion_constant_k: fusionConstantK };
    if (queryVector) body.query_vector = queryVector;
    if (queryTerms) body.query_terms = queryTerms;
    if (queryText) body.query_text = queryText;
    if (sparseEarlyTerminateThreshold != null)
      body.sparse_early_terminate_threshold = sparseEarlyTerminateThreshold;
    return this._post(`/vectordb/collections/${collection}/search/hybrid`, body);
  }

  batchSearchHybrid(collection, queries) {
    return this._post(
      `/vectordb/collections/${collection}/search/batch-hybrid`,
      { queries },
    );
  }

  // ---- vectors / versions ----

  getVector(collection, vectorId) {
    return this._get(`/vectordb/collections/${collection}/vectors/${vectorId}`);
  }

  vectorsByDocument(collection, documentId) {
    return this._get(
      `/vectordb/collections/${collection}/vectors?document_id=${encodeURIComponent(documentId)}`,
    );
  }

  listVersions(collection) {
    return this._get(`/vectordb/collections/${collection}/versions`);
  }

  currentVersion(collection) {
    return this._get(`/vectordb/collections/${collection}/versions/current`);
  }
}

export default Client;
