package com.mongodb;

/** Stub of the partial-failure bulk exception: carries the partial
 * result + per-item errors, the unordered-continue shape the binding
 * unpacks reflectively.
 */
public class MongoBulkWriteException extends MongoException {
    private final com.mongodb.bulk.BulkWriteResult result;
    private final java.util.List<com.mongodb.bulk.BulkWriteError> errors;

    public MongoBulkWriteException(com.mongodb.bulk.BulkWriteResult result,
            java.util.List<com.mongodb.bulk.BulkWriteError> errors) {
        super("bulk write errors: " + errors.size());
        this.result = result;
        this.errors = errors;
    }

    public com.mongodb.bulk.BulkWriteResult getWriteResult() { return result; }
    public java.util.List<com.mongodb.bulk.BulkWriteError> getWriteErrors() { return errors; }
}
