package com.mongodb.bulk;

/** Stub of com.mongodb.bulk.BulkWriteResult — the four accessors the
 * binding reflects, with the real int/List signatures.
 */
public class BulkWriteResult {
    private final int inserted, matched, modified;
    private final java.util.List<Object> upserts;

    public BulkWriteResult(int inserted, int matched, int modified,
            java.util.List<Object> upserts) {
        this.inserted = inserted;
        this.matched = matched;
        this.modified = modified;
        this.upserts = upserts;
    }

    public int getInsertedCount() { return inserted; }
    public int getMatchedCount() { return matched; }
    public int getModifiedCount() { return modified; }
    public java.util.List<Object> getUpserts() { return upserts; }
}
